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
      // oracle-parity hashing passed explicitly: the operator's DEFAULT is
      // the production xxhash64/64 path (different signatures by design)
      assert(out(NearDup.pairs(docs, n, NearDup.SimhashBits,
        graft.functions.Canon.md5Long)) == b4)

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
      // (corpus signatures are md5-based here, so the batch side must hash
      // the same way — hashes must match the persisted signature table)
      val newDocs = docs.filter(isNew)
      val viaOp = NearDup.pairsIncremental(newDocs, simOld, docs.count(),
          NearDup.SimhashBits, graft.functions.Canon.md5Long)
        .collect().map(_.toSeq).toSet
      assert(viaOp == expected)
    } finally sim.unpersist()
  }

  test("production xxhash64 path: same dup structure as md5 on exact-dup clusters, derived 64-bit geometry") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 6 exact-duplicate clusters of 3 + 30 distinct documents: both hash
    // families MUST agree on this corpus (identical texts hash identically
    // under any hash; the distinct docs share no tokens, so their simhashes
    // sit ~bits/2 apart — far outside HD under either width)
    val texts = (0 until 6).flatMap { c =>
      val t = (0 until 40).map(i => s"cluster${c}tok${i * 7 % 40}").mkString(" ")
      Seq.fill(3)(t)
    } ++ (0 until 30).map(d =>
      (0 until 40).map(i => s"only${d}word${i}x${d * i}").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val expected = (0 until 6).flatMap { c =>
      val ids = (c * 3 until c * 3 + 3).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield Seq[Any](a, b, 0)
    }.toSet
    val viaXx = NearDup.pairs(docs, 48L).collect().map(_.toSeq).toSet
    val viaMd5 = NearDup.pairs(docs, 48L, NearDup.SimhashBits,
      graft.functions.Canon.md5Long).collect().map(_.toSeq).toSet
    assert(viaXx == expected, s"xx path: $viaXx")
    assert(viaMd5 == expected, "md5 path disagrees on exact-dup structure")
    // and the xx simhash really uses the full 64-bit width (some corpus
    // hash must set the top nibble md5Long can never reach)
    val xxSim = NearDup.simhash(docs, NearDup.XxHashBits, NearDup.xxTokenHash)
      .select("simhash").collect().map(_.getLong(0))
    assert(xxSim.exists(h => (h >>> 60) != 0L),
      "64-bit path never set bits 60-63")
    // incremental xx path: batch = one member of cluster 5 (id 17) + one
    // distinct doc (id 47) — probes xx corpus signatures, same contract
    val isNew = col("doc_id") === 17 || col("doc_id") === 47
    val corpusXx = NearDup.simhash(docs.filter(!isNew),
      NearDup.XxHashBits, NearDup.xxTokenHash)
    val incXx = NearDup.pairsIncremental(docs.filter(isNew), corpusXx, 48L)
      .collect().map(_.toSeq).toSet
    val fullTouching = viaXx.filter(p => p(0) == 17L || p(1) == 17L ||
      p(0) == 47L || p(1) == 47L)
    assert(fullTouching.nonEmpty && incXx == fullTouching)
  }

  test("simhashTotal: one row per doc, empty-token docs sign 0 and pair as exact dups") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two empty-ish docs (no tokens after tokenization) + two real dups:
    // plain simhash drops the token-less docs entirely — the engine's
    // persisted signature table must not
    val mixed = Seq(
      (1L, "shared near dup text body one"),
      (2L, "shared near dup text body one"),
      (3L, ""),
      (4L, "   ")).toDF("doc_id", "text")
    // same production hashing on both sides (plain simhash DEFAULTS to the
    // oracle-parity md5/60 geometry, simhashTotal to xxhash64/64)
    val partial = NearDup.simhash(mixed, NearDup.XxHashBits,
      NearDup.xxTokenHash)
    assert(partial.count() == 2, "test premise: explode drops token-less docs")
    val total = NearDup.simhashTotal(mixed).cache()
    try {
      assert(total.count() == 4, "simhashTotal must emit one row per doc")
      val byId = total.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byId(3L) == 0L && byId(4L) == 0L,
        "empty-token docs must carry the empty-set signature 0")
      assert(byId(1L) == byId(2L) && byId(1L) != 0L)
      // and the signatures flow through banding: both the real dups AND
      // the degenerate empty pair surface at hd 0
      val pairs = NearDup.pairsFromSimhash(total, 4, NearDup.XxHashBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs.contains((1L, 2L, 0)) && pairs.contains((3L, 4L, 0)),
        s"expected both dup pairs at hd 0, got $pairs")
      // non-empty rows are byte-identical to plain simhash
      assert(partial.collect().map(_.toSeq).toSet ==
        total.filter(col("doc_id") < 3).collect().map(_.toSeq).toSet)
    } finally { total.unpersist(); () }
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
