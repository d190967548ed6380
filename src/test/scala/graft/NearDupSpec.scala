package graft

import graft.functions.Banding
import graft.operators.NearDup

/** The near-dup OPERATOR (round-3 verdict item 5): one call with a
  * runtime-derived block count must reproduce the oracle-checked fixed-B
  * instances exactly — B is a cost knob, never a recall knob.
  */
class NearDupSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "text")

  test("derived-B pairs ≡ the pinned B=4 and B=6 instances") {
    val sim = NearDup.simhash(docs).cache()
    try {
      def out(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet
      val b4 = out(NearDup.pairsFromSimhash(sim, 4))
      val b6 = out(NearDup.pairsFromSimhash(sim, 6))
      assert(b4 == b6, "B=4 vs B=6 disagree — construction exactness broken")
      assert(b4.nonEmpty, "test premise: corpus has near-dup pairs")

      // the one-call path: B derived from the true corpus size lands on the
      // smallest geometry and matches
      val n = docs.count()
      val bDerived = Banding.blocksFor(n, hashBits = NearDup.SimhashBits)
      assert(bDerived == 4, s"sf0.001 corpus should derive B=4, got $bDerived")
      assert(out(NearDup.pairs(docs, n)) == b4)

      // a web-scale size hint derives a wider geometry (more, narrower-key
      // tables) and is STILL output-identical — recall never depends on B
      val bWide = Banding.blocksFor(10000000000L, hashBits = NearDup.SimhashBits)
      assert(bWide > 4, s"10^10 docs must widen the geometry, got B=$bWide")
      assert(out(NearDup.pairsFromSimhash(sim, bWide)) == b4)
    } finally sim.unpersist()
  }

  test("incremental pairs ≡ full pairs filtered to the new batch") {
    import org.apache.spark.sql.functions._
    val sim = NearDup.simhash(docs).cache()
    try {
      // deterministic split: ~1/4 of the corpus is the "new" ingest batch
      val isNew = pmod(col("doc_id"), lit(4)) === 0
      val simNew = sim.filter(isNew)
      val simOld = sim.filter(!isNew)
      assert(simNew.count() > 0 && simOld.count() > 0)

      val newIds = simNew.select("doc_id").collect().map(_.get(0)).toSet
      val full = NearDup.pairsFromSimhash(sim, 4).collect()
        .map(_.toSeq).toSet
      val expected = full.filter(p =>
        newIds.contains(p(0)) || newIds.contains(p(1)))
      assert(expected.nonEmpty, "test premise: some pairs touch the batch")
      assert(expected.size < full.size,
        "test premise: some old-old pairs exist to be skipped")

      val inc = NearDup.incrementalFromSimhash(simNew, simOld, 4)
        .collect().map(_.toSeq).toSet
      assert(inc == expected,
        s"incremental=${inc.size} expected=${expected.size}")

      // geometry stays a pure cost knob on the incremental path too
      val incB6 = NearDup.incrementalFromSimhash(simNew, simOld, 6)
        .collect().map(_.toSeq).toSet
      assert(incB6 == expected)

      // the one-call derived-B entry point over raw (doc_id, text) batches
      val newDocs = docs.filter(isNew)
      val viaOp = NearDup.pairsIncremental(newDocs, simOld, docs.count())
        .collect().map(_.toSeq).toSet
      assert(viaOp == expected)
    } finally sim.unpersist()
  }

  test("operator simhash matches the q25 oracle-checked values") {
    // NearDup.simhash IS q25's projection (QueriesText delegates); pin the
    // linkage so a drift in either side breaks loudly
    val viaQuery = SparkEntry.queries("q25_dedup_simhash")(spark, dir)
      .collect().map(r => (r.get(0), r.getLong(1))).toMap
    val viaOp = NearDup.simhash(docs)
      .collect().map(r => (r.get(0), r.getLong(1))).toMap
    assert(viaOp == viaQuery)
  }
}
