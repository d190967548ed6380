package graft

import org.apache.spark.sql.SparkSession
import graft.ckpt.SnapshotStore
import graft.engine.EpochDriver
import graft.gen.SimWeb

/** CLI entry for the crawl engine — the spark-submit surface of the north
  * rule. Runs (or resumes) an epoch loop over the simulated web and prints
  * one JSON line with per-epoch counters and URLs-fetched+deduped/sec.
  *
  * Usage: runMain graft.Crawl <storeDir> <seeds> <nHosts> <epochs>
  *   [budgetMs] [compactEvery] [minorEvery]
  * Parallelism/partitions come from SPARK_GRAFT_CPUS (default 32) so the
  * same job can be run at two cluster sizes for the scaling-efficiency
  * evidence (BASELINE.md protocol). Seen-table AND frontier-log compaction
  * run every `compactEvery` epochs (default 4, 0 = off) — a long crawl
  * otherwise accumulates one seen partition directory + one frontier delta
  * dir per epoch, and the anti-join / merge-on-read scans pay per-file
  * open costs forever. `minorEvery` (default 0 = off) adds MINOR frontier
  * folds between the majors — delta-log resolve + head refresh, O(delta
  * window), base untouched — the regime for stretching `compactEvery`
  * 10-100× at the north-rule geometry (e.g. compactEvery=32 minorEvery=4
  * vs the old compactEvery=4: same counters, 1/8th the base-rewrite bytes).
  *
  * SPARK_GRAFT_BLOOM_ROUTED=1 switches the seen-set prefilter to the
  * segment-ROUTED probe (no merged Bloom broadcast anywhere — the
  * ≳10^10.5-URL geometry, operators/Seen.filterUnseenRouted). Counters are
  * byte-identical to the broadcast path (EngineSpec pins this); the knob
  * is pure execution strategy.
  */
object Crawl {

  /** The session settings `main` applies, EXCLUDING anything the deployer
    * already provided: spark-submit places `--master` and every `--conf`
    * into system properties BEFORE `main` runs, and an unconditional
    * `.master()`/`.config()` would override them — the documented
    * `--master yarn --conf spark.sql.shuffle.partitions=2000` cluster
    * invocation would silently run `local[cpus]` with 32 shuffle
    * partitions inside the driver process. Pure so CrawlCliSpec can pin
    * the precedence rule: `has` answers "did the deployer set this key".
    * The UTC session time zone is NOT here — it is forced unconditionally
    * (KST virtual time / job-id derivation are semantics, not tuning).
    */
  private[graft] def sessionDefaults(
      has: String => Boolean, cpus: String): Seq[(String, String)] =
    Seq(
      "spark.sql.shuffle.partitions" -> cpus,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.ui.enabled" -> "false",
      "spark.master" -> s"local[$cpus]"
    ).filterNot { case (k, _) => has(k) }

  def main(args: Array[String]): Unit = {
    val storeDir = args.lift(0).getOrElse("target/crawl-store")
    val nSeeds = args.lift(1).map(_.toInt).getOrElse(200)
    val nHosts = args.lift(2).map(_.toInt).getOrElse(50)
    val epochs = args.lift(3).map(_.toInt).getOrElse(3)
    val budgetMs = args.lift(4).map(_.toLong).getOrElse(60000L)
    val compactEvery = args.lift(5).map(_.toInt).getOrElse(4)
    val minorEvery = args.lift(6).map(_.toInt).getOrElse(0)
    val seed = 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // honor externally-provided settings (see sessionDefaults): deployer
    // values win, these are defaults only; the time zone stays FORCED
    val spark = sessionDefaults(sys.props.contains, cpus)
      .foldLeft(SparkSession.builder()
        .config("spark.sql.session.timeZone", "UTC")) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.configure(spark)

    if (sys.env.contains("SPARK_GRAFT_PROFILE")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val dur = for {
              a <- i.submissionTime; b <- i.completionTime
            } yield b - a
            System.err.println(
              f"[stage] ${i.stageId}%4d tasks=${i.numTasks}%4d wall=${dur.getOrElse(-1L)}%6dms cpu=${i.taskMetrics.executorRunTime}%7dms ${i.name.take(60)}")
          }
        })
    }

    val store = new SnapshotStore(storeDir, spark)
    // SPARK_GRAFT_SINK_DIR: emit per-epoch fresh records + job-control
    // messages through the batched K1/K2 sink (file-backed bridge topics)
    val driver = new EpochDriver(spark, store, seed, nHosts,
      epochBudgetMs = budgetMs, compactSeenEvery = compactEvery,
      compactFrontierEvery = compactEvery,
      compactDeltaEvery = minorEvery,
      bloomRouted = sys.env.get("SPARK_GRAFT_BLOOM_ROUTED").contains("1"),
      // SPARK_GRAFT_SCHED_HEAD=0 disables the frontier-head fast path
      // (full pending scan per epoch) — batches are identical either way;
      // the knob exists for A/B measurement and for geometries where
      // hosts*K exceeds the pending set (head pays without saving)
      scheduleFromHead = !sys.env.get("SPARK_GRAFT_SCHED_HEAD").contains("0"),
      // SPARK_GRAFT_HEAD_FRACTION: head cost-guard threshold over the
      // exactly-tracked pending_rows counter (skip builds/refreshes when
      // nHosts*K > fraction * pending). Default "inf" = head always
      // engaged: the interleaved A/B at hosts*K ~50x pending still
      // measured head-ON faster (BASELINE.md round 5). The knob exists
      // for geometries an operator measures otherwise; SCHED_HEAD=0
      // remains the hard off switch
      headMaxPendingFraction = sys.env.get("SPARK_GRAFT_HEAD_FRACTION")
        .map(s => if (s == "inf") Double.PositiveInfinity else s.toDouble)
        .getOrElse(Double.PositiveInfinity),
      // SPARK_GRAFT_NEARDUP=1: near-dup each epoch's fetched docs against
      // the persisted corpus signatures (corpus_sim) and append the batch's
      // signatures — the steady-state training-data ingest shape. Resume-
      // guarded (cfg_neardup): a store carries the flag it was created with
      nearDupDocs = sys.env.get("SPARK_GRAFT_NEARDUP").contains("1"),
      // SPARK_GRAFT_MEDIA=1: extract real media features (JDK pixel decode
      // + luma embedding) from each epoch's fetched docs' media spans into
      // the media_features table — the media half of the interleaved
      // corpus ingest. Resume-guarded (cfg_media)
      mediaDocs = sys.env.get("SPARK_GRAFT_MEDIA").contains("1"),
      sinkDir = sys.env.get("SPARK_GRAFT_SINK_DIR"),
      // SPARK_GRAFT_KAFKA_BRIDGE: Kafka REST bridge base URL — every sink
      // batch body is also POSTed to <url>/topics/<topic> (the reference's
      // transport, kafka_producer.py). Needs SPARK_GRAFT_SINK_DIR
      sinkBridge = sys.env.get("SPARK_GRAFT_KAFKA_BRIDGE"))
    if (store.latest().isEmpty)
      driver.init(SimWeb.seedUrls(nSeeds, nHosts, seed))

    val t0 = System.nanoTime()
    val metrics = driver.run(epochs)
    val dt = (System.nanoTime() - t0) / 1e9
    val fetched = metrics.map(_("fetched")).sum
    val discovered = metrics.map(_("discovered")).sum
    val emitted = metrics.map(_("emitted")).sum
    // numerator = fetched + post-dedup fresh URLs ("deduped" in the metric
    // name means "survived dedup") — the SAME definition BenchCrawl/Bench
    // use (nFrontier + fresh), so the two entry points are comparable
    val urlsPerSec = (fetched + emitted) / dt
    val epochJson = metrics.map(m =>
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")).mkString("[", ",", "]")
    println(
      s"""{"metric":"urls_fetched_plus_deduped_per_sec","value":$urlsPerSec,"unit":"urls/sec","wall_sec":$dt,"fetched":$fetched,"discovered":$discovered,"emitted":$emitted,"epochs":$epochJson,"cpus":$cpus}""")
    spark.stop()
  }
}
