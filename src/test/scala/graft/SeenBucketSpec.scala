package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ckpt.SnapshotStore
import graft.operators.Seen

/** Bucketed seen-table behavior (round-1 verdict item 6): the append-only
  * URL-seen set is stored CLUSTERED BY canon_url, so the per-epoch
  * anti-join shuffles only the small candidate side — the big seen side
  * scans pre-partitioned. Also pins the resume-idempotency property (same
  * epoch written twice = one copy) and the committed-epoch gate.
  */
class SeenBucketSpec extends SparkSpecBase {

  import spark.implicits._

  private def newStore(): SnapshotStore =
    new SnapshotStore(
      Files.createTempDirectory("seen-bucket").toString, spark, seenBuckets = 8)

  test("epoch append is idempotent and the committed-epoch gate prunes") {
    val store = newStore()
    store.appendSeen((0 until 100).map(i => s"https://h/$i").toDF("canon_url"), 0L)
    store.appendSeen((50 until 150).map(i => s"https://h/$i").toDF("canon_url"), 1L)
    // crash-replay: epoch 1 written again → overwrites, never duplicates
    store.appendSeen((50 until 150).map(i => s"https://h/$i").toDF("canon_url"), 1L)
    assert(store.readSeen(1L).count() === 200)
    assert(store.readSeen(1L).distinct().count() === 150)
    // gate: an uncommitted (higher-epoch) partition is invisible
    store.appendSeen((500 until 600).map(i => s"https://h/$i").toDF("canon_url"), 2L)
    assert(store.readSeen(1L).count() === 200)
    val gated = store.readSeen(1L)
    val scan = gated.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("epoch"),
      s"expected epoch partition pruning in scan:\n$scan")
  }

  test("anti-join against bucketed seen shuffles only the candidate side") {
    val store = newStore()
    store.appendSeen((0 until 2000).map(i => s"https://h/$i").toDF("canon_url"), 0L)
    val cand = (1500 until 2500).map(i => s"https://h/$i").toDF("canon_url")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fresh = Seen.filterUnseen(cand, "canon_url", store.readSeen(0L), None)
      assert(fresh.count() === 500)
      val p = fresh.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"),
        s"seen scan must use its bucketing:\n$p")
      val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1,
        s"expected exactly 1 exchange (candidates only), got $exchanges:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("compaction folds epochs into one partition without changing the set") {
    val store = newStore()
    store.appendSeen((0 until 100).map(i => s"https://h/$i").toDF("canon_url"), 0L)
    store.appendSeen((50 until 150).map(i => s"https://h/$i").toDF("canon_url"), 1L)
    store.appendSeen((100 until 200).map(i => s"https://h/$i").toDF("canon_url"), 2L)
    val before = store.readSeen(2L).distinct().collect().map(_.getString(0)).toSet
    store.compactSeen(2L)
    val after = store.readSeen(2L)
    assert(after.collect().map(_.getString(0)).toSet === before)
    // folded: no duplicates remain, everything lives in epoch 0
    assert(after.count() === 200)
    // later epochs keep appending on top of the compacted base
    store.appendSeen((200 until 250).map(i => s"https://h/$i").toDF("canon_url"), 3L)
    assert(store.readSeen(3L).count() === 250)
  }

  test("a fresh store instance on the same path sees prior epochs (re-registration)") {
    val dir = Files.createTempDirectory("seen-bucket").toString
    val s1 = new SnapshotStore(dir, spark, seenBuckets = 8)
    s1.appendSeen((0 until 100).map(i => s"https://h/$i").toDF("canon_url"), 0L)
    val s2 = new SnapshotStore(dir, spark, seenBuckets = 8)
    assert(s2.readSeen(0L).count() === 100)
  }
}
