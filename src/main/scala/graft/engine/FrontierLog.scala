package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log-structured frontier (round-3 verdict item 1 — the engine's last
  * full-table-rewrite): the frontier is stored as
  *
  *   - `frontier_base` — the resolved LIVE window, replaced only at init
  *     and at periodic compaction epochs (state-partitioned; after a
  *     non-draining fold it holds only pending rows — see the archive),
  *   - `frontier_delta` — per-epoch APPENDED state-transition rows (the
  *     scheduled batch's new states) and fresh inserts, each carrying
  *     `seq` = the epoch that wrote it, plus
  *   - `frontier_archive` — append-only terminal history: fetched/failed
  *     rows are absorbing (a URL enters the frontier exactly once), so each
  *     fold RENAMES its terminal partitions out of the staged base instead
  *     of re-resolving them forever — fold cost is O(pending + delta
  *     window), independent of crawl age (EpochDriver's archive-by-rename
  *     block).
  *
  * A normal epoch therefore commits O(batch + fresh) frontier bytes instead
  * of rewriting the whole table — at the north rule's 10^10-URL frontier
  * that is the difference between ~hundreds of GB and ~tens of MB of
  * parquet I/O per epoch (FrontierLogSpec pins the byte ratio). Reads
  * resolve merge-on-read: latest row per canon_url by `seq` (transitions
  * are monotone — pending may repeat through retries, fetched/failed are
  * absorbing — and one epoch writes at most one row per URL, so `seq` is a
  * total per-key order). Compaction is two-tier: MINOR folds (EpochDriver
  * `compactDeltaEvery`) resolve the delta log into one run and refresh the
  * scheduler head — O(delta window), base untouched — while MAJOR folds
  * (`compactFrontierEvery`) rewrite base+deltas and archive terminals —
  * O(pending), so their cadence stretches 10-100× once minor folds keep the
  * log compact. Both are view-identical, like `compactSeen`.
  */
object FrontierLog {

  /** Physical frontier row: the engine's frontier columns plus the
    * merge-on-read sequence number.
    */
  val Cols: Seq[String] = Seq("canon_url", "host", "depth", "score", "state",
    "retry_count", "discovered_epoch", "seq")

  /** Latest row per canon_url by seq over any mix of base + delta rows.
    * One shuffle on the scalar key; the payload rides inside a struct.
    */
  def resolve(all: DataFrame): DataFrame = {
    val payload = Cols.filterNot(_ == "canon_url")
    all.groupBy("canon_url")
      .agg(max_by(struct(payload.map(col): _*), col("seq")).as("_r"))
      .select(col("canon_url") +: payload.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** The pending slice of the merged view WITHOUT shuffling the frontier.
    *
    * Two facts make this cheap:
    *  - the base is a RESOLVED materialization (init/compaction write at
    *    most one row per canon_url), so base rows never contend with each
    *    other — only with delta rows;
    *  - every delta row supersedes the base row of the same key outright:
    *    a key's base `seq` is at most the fold epoch, and every delta
    *    appended after that fold carries `seq` = a later epoch.
    *
    * So:
    *
    *   pending = (base pending rows  ANTI-JOIN  all delta keys)
    *           ∪ (delta-internal latest pending  ANTI-JOIN  terminal delta keys)
    *
    * The base side is partition-pruned to its pending files and reaches
    * the scheduler with NO exchange: the anti-join's probe set (distinct
    * delta keys) is compaction-bounded — O(batch × compaction cadence)
    * rows, an engine knob — so Spark broadcasts it (FrontierLogSpec pins
    * the BroadcastHashJoin LeftAnti shape; at a geometry where even that
    * key set outgrows a broadcast, the documented path is the segmented
    * Bloom routing the seen table already uses: broadcast the segment
    * filters, exact-check only bloom-positive base rows, which are
    * ~|delta| + the false-positive sliver). Everything that DOES shuffle
    * here — the delta-internal resolve and the two distincts — is
    * delta-sized, never frontier-sized. Equals
    * `resolve(base ∪ delta).filter(state = pending)` exactly
    * (FrontierLogSpec pins the equivalence on mixed histories).
    */
  def pending(base: DataFrame, delta: Option[DataFrame]): DataFrame =
    pendingResolved(base, delta).drop("seq")

  /** [[pending]] with `seq` retained — the minor-fold head refresh
    * re-materializes its output as the next scheduler head, which must stay
    * schema-identical to a fold-built head (FrontierLog.Cols). Same plan.
    */
  def pendingResolved(base: DataFrame, delta: Option[DataFrame]): DataFrame =
    delta match {
      case None => base.filter(col("state") === "pending")
      case Some(d) =>
        val dKeys = d.select("canon_url").distinct()
        val dTerminal = d.filter(col("state") =!= "pending")
          .select("canon_url").distinct()
        val dPending = resolve(d.filter(col("state") === "pending"))
          .join(dTerminal, Seq("canon_url"), "left_anti")
        base.filter(col("state") === "pending")
          .join(dKeys, Seq("canon_url"), "left_anti")
          .unionByName(dPending)
    }
}
