package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Canon

/** Structured Streaming surface (builder brief): the reference has no
  * event-time semantics (SURVEY §2.8 — all pacing is processing-time
  * sleeps), so the epoch engine is batch; this module provides the
  * streaming-native equivalents for deployments where discoveries arrive
  * continuously: watermarked per-host windowed discovery counts, and a
  * stateful per-host politeness gate via mapGroupsWithState.
  */
object FrontierStream {

  final case class Discovery(ts: java.sql.Timestamp, url: String)

  final case class HostState(lastEmittedMs: Long, emitted: Long, suppressed: Long)

  final case class Gated(host: String, canon_url: String, emitted: Boolean)

  /** Canonicalize a discovery stream and count distinct-ish discoveries per
    * host per 10-second window with a 30-second watermark (late data beyond
    * the watermark is dropped — bounded state).
    */
  def windowedDiscoveryCounts(stream: DataFrame, base: String): DataFrame = {
    val canoned = Canon.canonicalize(stream, "url", base)
      .filter(Canon.isHttp(col("canon_url")))
    canoned
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("host"))
      .agg(count(lit(1)).as("n_discovered"),
        approx_count_distinct("canon_url").as("n_distinct_approx"))
  }

  /** Idle host state expires after this much processing time — the host set
    * of a crawl is unbounded, so without a timeout per-host state would
    * accumulate forever (state size would track every host ever seen
    * instead of the active working set).
    *
    * Deployment note: run the gate with a non-zero processing-time trigger
    * (e.g. Trigger.ProcessingTime("30 seconds")). Pending timeouts make a
    * zero-interval/AvailableNow query schedule empty micro-batches
    * back-to-back until the timeout deadline — a busy loop, not progress.
    */
  val IDLE_STATE_TIMEOUT = "10 minutes"

  /** Stateful per-host politeness gate: at most one emission per
    * `delayMs` of *event time* per host; the rest are suppressed and
    * counted. KeyValueGroupedDataset.flatMapGroupsWithState with a
    * processing-time idle timeout — the streaming analog of the epoch
    * engine's token bucket (T4). Event order inside a trigger batch is made
    * deterministic by sorting on (ts, canon_url).
    *
    * Cross-trigger ordering contract: events are gated in ARRIVAL (trigger)
    * order. A late event whose ts predates the host's lastEmittedMs but
    * that arrives in a later trigger is treated as over-rate and suppressed
    * (its event-time delta is negative) — politeness is a rate LIMIT, so
    * suppressing late stragglers errs on the polite side; bound genuine
    * lateness upstream with a watermark (as windowedDiscoveryCounts does)
    * if late data must instead be dropped.
    */
  def politenessGate(discoveries: Dataset[Discovery], base: String,
      delayMs: Long): Dataset[Gated] = {
    val spark = discoveries.sparkSession
    import spark.implicits._
    val canoned = Canon.canonicalize(discoveries.toDF(), "url", base)
      .filter(Canon.isHttp(col("canon_url")))
      .select(col("host"), col("canon_url"), col("ts"))
      .as[(String, String, java.sql.Timestamp)]

    canoned
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        (host: String, rows: Iterator[(String, String, java.sql.Timestamp)],
            state: GroupState[HostState]) => {
          if (state.hasTimedOut) {
            // idle host: release its state; a future discovery simply
            // starts fresh (first event after expiry always emits, which is
            // correct — the host has been quiet for >= the timeout)
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(HostState(-1L, 0L, 0L))
            val out = rows.toSeq.sortBy(r => (r._3.getTime, r._2)).map { r =>
              val t = r._3.getTime
              if (st.lastEmittedMs < 0 || t - st.lastEmittedMs >= delayMs) {
                st = HostState(t, st.emitted + 1, st.suppressed)
                Gated(host, r._2, emitted = true)
              } else {
                st = st.copy(suppressed = st.suppressed + 1)
                Gated(host, r._2, emitted = false)
              }
            }
            state.update(st)
            state.setTimeoutDuration(IDLE_STATE_TIMEOUT)
            out.iterator
          }
        })
  }
}
