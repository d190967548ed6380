package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon
import graft.gen.SimWeb
import graft.model.FetchTask

/** Per-host politeness + priority-queue scheduling (SURVEY.md §2.6 W2/W5,
  * §2.8 T4; north rule). The reference paces fetches with hard-coded
  * processing-time sleeps (src/api/crawling_review.py:517,
  * src/api/crawling_info_list.py:90); here the budget is enforced in
  * deterministic *virtual time*: each host gets `epochBudgetMs` of virtual
  * milliseconds per epoch, each fetch costs its robots crawl-delay, and the
  * batch is cut by a running-sum window over the per-host priority order.
  */
object Sched {

  /** Floor of every crawl delay robotsFor can emit (and of the engine's
    * default delay): the scheduler's per-host window pre-cut derives its
    * exact rank bound from this.
    */
  val MinCrawlDelayMs = 500L

  /** Deterministic robots table for a set of hosts: crawl-delay in
    * [MinCrawlDelayMs, 3000) ms and a /search disallow for every 4th host
    * (hash-picked). Mirrored exactly by the sequential oracle.
    */
  def robotsFor(hosts: Seq[String], seed: Long): Seq[(String, Long, Seq[String])] =
    hosts.map { h =>
      val m = SimWeb.mix(seed, s"robots:$h") & Long.MaxValue
      val delay = MinCrawlDelayMs + m % 2500L
      val disallow = if (m % 4 == 0) Seq("/search") else Seq.empty[String]
      (h, delay, disallow)
    }

  def robotsDf(spark: SparkSession, hosts: Seq[String], seed: Long): DataFrame =
    robotsDf(spark, robotsFor(hosts, seed))

  /** The one place the robots column-name contract lives: callers that
    * also need the raw rows (e.g. to derive the exact delay floor) build
    * the DataFrame through here rather than hand-rolling the names.
    */
  def robotsDf(spark: SparkSession,
      rows: Seq[(String, Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("host", "crawl_delay_ms", "disallow")
  }

  /** Robots disallow filter: drop candidates whose path starts with any
    * disallowed prefix for its host (J3 + path predicate). Unknown hosts
    * default to allowed with `defaultDelayMs`.
    */
  def allowed(candidates: DataFrame, robots: DataFrame,
      defaultDelayMs: Long): DataFrame = {
    val withPath = candidates.withColumn("_path",
      regexp_extract(col("canon_url"), "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
    withPath
      .join(broadcast(robots), Seq("host"), "left")
      .withColumn("crawl_delay_ms", coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
      .withColumn("_blocked",
        coalesce(exists(col("disallow"), p => col("_path").startsWith(p)), lit(false)))
      .filter(!col("_blocked"))
      .drop("_blocked", "_path", "disallow")
  }

  /** W2 + T4: per-host priority rank (score desc, depth asc, canon_url asc —
    * the deterministic total order of SURVEY note N7) and virtual-time
    * budget cut. Input must carry host, canon_url, depth, score,
    * crawl_delay_ms. Output adds rank and cum_cost_ms, keeps rows whose
    * cumulative cost fits the epoch budget.
    *
    * Scale shape (round-3 verdict item 2): every fetch costs at least
    * `minDelayMs`, so no row ranked past floor(budget / minDelayMs) can
    * ever fit the budget — the per-host window is PRE-CUT to that rank
    * before the running cost sum. The rank filter directly above the
    * row_number window rewrites to WindowGroupLimitExec (per-partition
    * top-k insertion, pinned in PlanSpec), so a 10^10-row pending set pays
    * top-k-per-host instead of a full per-host sort+scan; only the ≤cut
    * survivors reach the cum-sum window (same host partitioning — no second
    * exchange). The cut is exact, never semantic: callers whose delays can
    * undercut the engine's floor pass their true minimum (minDelayMs = 1
    * keeps correctness and merely loses the pre-cut, which then exceeds
    * the WindowGroupLimit rewrite threshold and stays a plain filter).
    */
  def rankAndBudget(pending: DataFrame, epochBudgetMs: Long,
      minDelayMs: Long = 1L): DataFrame = {
    val cut = budgetCut(epochBudgetMs, minDelayMs)
    pending
      .withColumn("rank", row_number().over(hostOrder))
      .filter(col("rank") <= cut)
      .withColumn("cum_cost_ms", sum(col("crawl_delay_ms")).over(
        hostOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_cost_ms") <= epochBudgetMs)
  }

  /** THE scheduler's per-host total order (SURVEY note N7). Single
    * definition shared by rankAndBudget and headSlice: the frontier-head
    * invariant (EpochDriver) requires the head's top-K order and the
    * scheduler's ranking order to be byte-identical, so they must not be
    * able to drift apart.
    */
  private val hostOrder = Window.partitionBy("host")
    .orderBy(col("score").desc, col("depth").asc, col("canon_url").asc)

  /** Per-host upper bound on rows one epoch can schedule under `budgetMs`
    * when every fetch costs at least `minDelayMs`. Single definition: the
    * frontier-head sizing/validity math (EpochDriver) is exact only if it
    * uses the very cut rankAndBudget applies.
    */
  def budgetCut(budgetMs: Long, minDelayMs: Long): Long =
    math.min(budgetMs / math.max(1L, minDelayMs), Int.MaxValue.toLong)

  /** Top-k rows per host by the scheduler's total order — the materialized
    * frontier-head slice. Runs as WindowGroupLimitExec (per-partition top-k
    * insertion) over one host exchange; used at fold epochs to cut the
    * pending frontier down to the only rows the next R epochs of
    * scheduling can possibly touch (see EpochDriver's head invariant).
    */
  def headSlice(pending: DataFrame, k: Long): DataFrame =
    pending.withColumn("_hr", row_number().over(hostOrder))
      .filter(col("_hr") <= k).drop("_hr")

  /** The typed epoch batch (north rule: "emits the next fetch batch as a
    * typed Dataset"), salted-repartitioned so one hot host spreads over
    * many partitions (W5) — the politeness budget was already applied
    * per-host *before* salting, so spreading cannot violate it.
    */
  def fetchBatch(ranked: DataFrame, epoch: Long, saltBuckets: Int,
      numPartitions: Int): Dataset[FetchTask] = {
    val spark = ranked.sparkSession
    import spark.implicits._
    ranked
      .select(lit(epoch).as("epoch"), col("host"), col("canon_url"),
        col("depth"), col("score"), col("rank"))
      .repartition(numPartitions,
        Canon.saltedKey(col("host"), col("canon_url"), saltBuckets))
      .as[FetchTask]
  }
}
