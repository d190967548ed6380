package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.FrontierStream
import graft.streaming.FrontierStream.Discovery

/** Structured Streaming semantics: watermarked windowed discovery counts and
  * the stateful per-host politeness gate, driven synchronously through
  * MemoryStream + processAllAvailable.
  */
class StreamingSpec extends SparkSpecBase {

  private val base = "https://www.shop0.example.com"

  private def ts(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  test("windowed discovery counts with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Discovery]
    in.addData(
      Discovery(ts(1), "https://A.com/p1"),
      Discovery(ts(2), "https://a.com/p2#frag"),
      Discovery(ts(4), "https://a.com/p2"),
      Discovery(ts(12), "https://b.com/x"))
    val q = FrontierStream.windowedDiscoveryCounts(in.toDF(), base)
      .writeStream.outputMode("complete").format("memory")
      .queryName("disc_counts").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val rows = spark.table("disc_counts")
      .selectExpr("host", "n_discovered").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    // a.com: 3 discoveries in window [0,10); b.com: 1 in [10,20)
    assert(rows == Set(("a.com", 3L), ("b.com", 1L)))
  }

  test("stateful politeness gate: at most one emission per delay per host") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Discovery]
    in.addData(
      Discovery(ts(0), "https://h.com/a"),   // emit (first)
      Discovery(ts(2), "https://h.com/b"),   // suppressed (2s < 5s)
      Discovery(ts(6), "https://h.com/c"),   // emit (6s since last emit)
      Discovery(ts(7), "https://other.com/z")) // emit (different host)
    val q = FrontierStream.politenessGate(in.toDS(), base, delayMs = 5000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("gated").start()
    // no processAllAvailable here: the gate's ProcessingTimeTimeout keeps
    // the (zero-interval) test query scheduling empty batches until the
    // idle deadline, so "all available" never quiesces — poll the sink for
    // the expected rows instead, then stop
    val deadline = System.currentTimeMillis() + 120000L
    while (spark.table("gated").count() < 4 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    val rows = spark.table("gated").collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toMap
    q.stop()
    assert(rows == Map(
      "https://h.com/a" -> true,
      "https://h.com/b" -> false,
      "https://h.com/c" -> true,
      "https://other.com/z" -> true))
  }
}
