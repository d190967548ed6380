package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Canon
import graft.gen.SimWeb
import graft.operators.{Bloom, Extract, Seen}

/** Scaling-evidence workload (BASELINE.md protocol): the epoch's data path —
  * fetch-sim → span explode → URL extraction → canonicalization → distinct →
  * Bloom-prefiltered exact anti-join against the seen set — over an
  * N-URL frontier slice, WITHOUT the snapshot-commit machinery. The epoch
  * loop at local scale is stage-latency-bound (~30 short stages per epoch:
  * scheduling + commit dominate, compute doesn't), which measures the
  * sandbox, not the engine; this path is the part whose cost grows with the
  * frontier and is what a 1000-executor run spends its time in. Run it at
  * SPARK_GRAFT_CPUS=8 and 32 on the same N to evidence N→4N scaling.
  *
  * Usage: runMain graft.BenchCrawl <nUrls> [nHosts]
  */
object BenchCrawl {

  /** One full pipeline pass (fetch-sim → extract → canon → distinct →
    * Bloom+exact dedup) over an n-URL frontier slice; returns
    * (freshDiscovered, wallSeconds).
    */
  def pipelineThroughput(spark: org.apache.spark.sql.SparkSession, n: Long,
      nHosts: Int, seed: Long = 42L): (Long, Double) = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism * 4
    def frontierUrls = spark.range(0, n, 1, parts)
      .mapPartitions(_.map { i =>
        val h = SimWeb.mix(seed, s"seed:$i")
        val host = SimWeb.hostName(SimWeb.zipfHost(h, nHosts))
        s"https://$host/vp/products/${h & Long.MaxValue}"
      })
      .toDF("canon_url")
    val t0 = System.nanoTime()
    val docs = frontierUrls.as[String]
      .mapPartitions(_.map(u => SimWeb.docFor(u, seed, nHosts)))
      .toDF()
    val cand = Extract.canonCandidates(docs)
    val segments = 32
    val bits = 1 << 22
    val segs = Bloom.collectSegments(
      Bloom.buildSegments(frontierUrls, "canon_url", segments, bits),
      segments, bits)
    val fresh = Seen.filterUnseen(
      cand.select("canon_url"), "canon_url", frontierUrls, Some(segs))
    val f = fresh.count()
    (f, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nHosts = args.lift(1).map(_.toInt).getOrElse(5000)
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "4m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)
    if (sys.env.contains("SPARK_GRAFT_PROFILE")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val dur = for { a <- i.submissionTime; b <- i.completionTime } yield b - a
            System.err.println(
              f"[stage] ${i.stageId}%4d tasks=${i.numTasks}%4d wall=${dur.getOrElse(-1L)}%6dms cpu=${i.taskMetrics.executorRunTime}%7dms")
          }
        })
    }
    import spark.implicits._

    val parts = spark.sparkContext.defaultParallelism * 4

    def frontierUrls = spark.range(0, n, 1, parts)
      .mapPartitions(_.map { i =>
        val h = SimWeb.mix(seed, s"seed:$i")
        val host = SimWeb.hostName(SimWeb.zipfHost(h, nHosts))
        s"https://$host/vp/products/${h & Long.MaxValue}"
      })
      .toDF("canon_url")

    def pipelineOnce(): (Long, Long) = {
      // fetch-sim: page content for every frontier URL (S1)
      val docs = frontierUrls.as[String]
        .mapPartitions(_.map(u => SimWeb.docFor(u, seed, nHosts)))
        .toDF()
      // extract + canon + distinct (S2/D2/X14/D1)
      val cand = Extract.canonCandidates(docs)
      // seen set = the frontier itself; Bloom segments built distributively,
      // collected + broadcast, exact anti-join as backstop (D3/J2)
      val segments = 32
      val bits = 1 << 22
      val segs = Bloom.collectSegments(
        Bloom.buildSegments(frontierUrls, "canon_url", segments, bits),
        segments, bits)
      val fresh = Seen.filterUnseen(
        cand.select("canon_url"), "canon_url", frontierUrls, Some(segs))
      (fresh.count(), n)
    }

    pipelineOnce() // warm: codegen + JIT
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    var freshN = 0L
    val walls = (1 to trials).map { _ =>
      val t0 = System.nanoTime()
      val (f, _) = pipelineOnce()
      freshN = f
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-N: external box contention only ever inflates wall time
    val dt = walls.min
    val ups = (n + freshN) / dt
    val wallsJson = walls.map(w => f"$w%.2f").mkString("[", ",", "]")
    println(
      s"""{"metric":"urls_fetched_plus_deduped_per_sec","value":$ups,"unit":"urls/sec","wall_sec":$dt,"walls":$wallsJson,"n_urls":$n,"fresh":$freshN,"cpus":$cpus}""")
    spark.stop()
  }
}
