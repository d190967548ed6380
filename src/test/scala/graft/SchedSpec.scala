package graft

import org.apache.spark.sql.functions._
import graft.functions.Canon
import graft.gen.SimWeb
import graft.operators.Sched

/** Scheduling + politeness + skew tests (SURVEY.md §5.2-6, W2/W5/T4). */
class SchedSpec extends SparkSpecBase {

  private val seed = 42L

  test("per-host virtual-time budget is never exceeded") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      val host = SimWeb.hostName(i % 5)
      (s"https://$host/p/$i", host, i % 4, 1.0 / (1 + i % 4))
    }.toDF("canon_url", "host", "depth", "score")
      .withColumn("crawl_delay_ms", lit(1000L))
    val budget = 7000L
    val ranked = Sched.rankAndBudget(rows, budget)
    val perHost = ranked.groupBy("host")
      .agg(max("cum_cost_ms").as("max_cum"), count(lit(1)).as("n"))
      .collect()
    perHost.foreach { r =>
      assert(r.getLong(1) <= budget)
      assert(r.getLong(2) == budget / 1000L) // exactly floor(budget/delay) picked
    }
  }

  test("window pre-cut is exact: identical output with and without it") {
    import spark.implicits._
    // per-row varying delays (all >= the 500ms floor) — the pre-cut bound
    // must hold for any delay mix, not only per-host-constant delays
    val rows = (0 until 800).map { i =>
      val host = SimWeb.hostName(i % 9)
      (s"https://$host/p/$i", host, i % 5, 1.0 / (1 + i % 13))
    }.toDF("canon_url", "host", "depth", "score")
      .withColumn("crawl_delay_ms", lit(500L) + col("depth") * lit(700L))
    def out(minDelay: Long) =
      Sched.rankAndBudget(rows, 9000L, minDelay).collect()
        .map(_.toSeq).toSet
    assert(out(Sched.MinCrawlDelayMs) == out(1L))
  }

  test("rank follows (score desc, depth asc, canon asc) priority order") {
    import spark.implicits._
    val rows = Seq(
      ("https://h/a", "h", 3, 0.5), ("https://h/b", "h", 1, 0.9),
      ("https://h/c", "h", 1, 0.5), ("https://h/d", "h", 0, 0.9))
      .toDF("canon_url", "host", "depth", "score")
      .withColumn("crawl_delay_ms", lit(1000L))
    val got = Sched.rankAndBudget(rows, 100000L)
      .orderBy("rank").select("canon_url").as[String].collect().toSeq
    assert(got == Seq("https://h/d", "https://h/b", "https://h/c", "https://h/a"))
  }

  test("salted repartition spreads a hot host: no partition above 2x mean") {
    import spark.implicits._
    // one host holds 50% of all URLs (the reference's single-hot-host
    // pathology, crawling_multi.py:48-61)
    val n = 4000
    val rows = (0 until n).map { i =>
      val host = if (i % 2 == 0) "hot.example.com" else SimWeb.hostName(i % 37)
      (s"https://$host/p/$i", host, 0, 1.0)
    }.toDF("canon_url", "host", "depth", "score")
      .withColumn("crawl_delay_ms", lit(1L))
    val parts = 16
    val batch = Sched.fetchBatch(
      Sched.rankAndBudget(rows, Long.MaxValue / 2), 1L, saltBuckets = 64,
      numPartitions = parts)
    val sizes = batch.rdd.mapPartitions(it => Iterator(it.size)).collect()
    val mean = sizes.sum.toDouble / parts
    assert(sizes.max <= 2 * mean,
      s"skewed partitions after salting: ${sizes.mkString(",")}")
    // and without salting, the hot host would necessarily concentrate:
    val unsalted = rows.repartition(parts, col("host"))
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(unsalted.max >= n / 2, "test premise: unsalted is skewed")
  }

  test("robots disallow filters matching paths only") {
    import spark.implicits._
    val hosts = (0 until 20).map(SimWeb.hostName)
    val robots = Sched.robotsDf(spark, hosts, seed)
    val blockedHosts = Sched.robotsFor(hosts, seed)
      .filter(_._3.nonEmpty).map(_._1).toSet
    assume(blockedHosts.nonEmpty)
    val h = blockedHosts.head
    val cand = Seq(
      (s"https://$h/search?q=x", h),
      (s"https://$h/vp/products/1", h)).toDF("canon_url", "host")
    val got = Sched.allowed(cand, robots, 2500L)
      .select("canon_url").as[String].collect().toSeq
    assert(got == Seq(s"https://$h/vp/products/1"))
  }
}
