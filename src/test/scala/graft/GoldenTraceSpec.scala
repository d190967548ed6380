package graft

import graft.ckpt.SnapshotStore
import graft.engine.EpochDriver
import graft.gen.SimWeb

/** Golden fetch-trace (SURVEY.md §5.2-7): the exact fetch sequence of a
  * known-seed crawl is pinned; any change to scheduling, canonicalization,
  * politeness, or the simulator that alters crawl order must be intentional
  * and update this hash.
  */
class GoldenTraceSpec extends SparkSpecBase {

  test("known-seed crawl reproduces the golden fetch trace") {
    val dir = java.nio.file.Files.createTempDirectory("golden").toString
    val d = new EpochDriver(spark, new SnapshotStore(dir, spark), 42L, 6,
      epochBudgetMs = 8000L)
    d.init(SimWeb.seedUrls(20, 6, 42L))
    (1 to 2).foreach(_ => d.runEpoch())
    val log = d.fetchLog().get.collect()
      .map(r => (r.getLong(0), r.getString(3), r.getInt(4), r.getString(2),
        r.getString(5)))
      .sortBy(t => (t._1, t._2, t._3))
    val trace = log.map(t => s"${t._1}|${t._2}|${t._3}|${t._4}|${t._5}")
      .mkString("\n")
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(trace.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(log.length == 32, s"golden trace row count changed: ${log.length}")
    assert(h == "248b78c8263d6efa4bf43de28a6e3d65",
      s"golden trace changed (md5=$h). First rows:\n${trace.linesIterator.take(6).mkString("\n")}")
  }
}
