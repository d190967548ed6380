package graft

import graft.functions.Banding
import graft.gen.SimWeb

/** Pins the two properties of the corpus-parameterized near-dup blocking
  * (round-2 verdict item 1), the way SchedSpec pins ≤2x salt skew:
  *
  *  1. EXACTNESS — for every supported block count B, any pair within
  *     hamming distance ≤ 3 shares at least one (table, key), so banded
  *     candidate generation has 100% recall.
  *  2. BUDGET — at a clustered 10^5-hash corpus with the DERIVED block
  *     count, total in-bucket candidate pairs stay linear in N (the
  *     per-bucket quadratic is the thing that kills a web-scale run).
  *
  * Plus the derivation itself: blocksFor/nPlanesFor grow with corpus size
  * so occupancy stays bounded at any scale.
  */
class BandingSpec extends SparkSpecBase {

  private def hashes(n: Int, seed: Long): IndexedSeq[Long] = {
    var h = seed
    IndexedSeq.fill(n) { h = SimWeb.splitmix(h); h }
  }

  /** Flip 1..3 distinct bits below `width` — a true near-dup at hd ≤ 3. */
  private def perturb(x: Long, seed: Long, width: Int = 64): Long = {
    var h = SimWeb.splitmix(seed)
    val nFlips = 1 + ((h & Long.MaxValue) % 3).toInt
    var out = x
    val flipped = scala.collection.mutable.Set.empty[Int]
    while (flipped.size < nFlips) {
      h = SimWeb.splitmix(h)
      val b = ((h & Long.MaxValue) % width).toInt
      if (flipped.add(b)) out ^= (1L << b)
    }
    out
  }

  test("exactness: hd<=3 pairs share a table key for B = 4, 5, 6, 8") {
    val bases = hashes(500, 0xabcdefL)
    for (b <- Seq(4, 5, 6, 8); (x, i) <- bases.zipWithIndex; j <- 0 until 10) {
      val y = perturb(x, i * 1000L + j)
      assert(Banding.shareTable(x, y, b),
        f"hd<=3 pair missed at B=$b: $x%016x vs $y%016x")
    }
  }

  test("60-bit instantiation (md5Long simhashes): exactness, undiluted keys") {
    // the simhash pipeline's informative width (QueriesText.SIMHASH_BITS =
    // 60: md5Long never sets bits 60-63). Blocks must partition only the
    // informative bits — key widths are 60-derived, not 64-derived
    assert(graft.queries.QueriesText.SIMHASH_BITS === 60)
    assert(Banding.keyWidthBits(4, 60) === 15)
    assert(Banding.keyWidthBits(6, 60) === 30)
    val bases = hashes(300, 0x60bedL).map(_ & ((1L << 60) - 1))
    for (b <- Seq(4, 6); (x, i) <- bases.zipWithIndex; j <- 0 until 6) {
      val y = perturb(x, i * 601L + j, width = 60)
      assert(Banding.shareTable(x, y, b, 60),
        f"60-bit hd<=3 pair missed at B=$b: $x%016x vs $y%016x")
    }
  }

  test("blocksFor grows with corpus size (key space tracks N)") {
    assert(Banding.blocksFor(100000L) === 4)   // 16-bit keys, 65k buckets
    assert(Banding.blocksFor(100000000L) === 5) // 25-bit keys
    assert(Banding.blocksFor(10000000000L) === 6) // 31-bit keys
    assert(Banding.blocksFor(1000000000000L) === 8) // 40-bit keys
    // monotone non-decreasing over 10^4..10^12
    val bs = (4 to 12).map(e => Banding.blocksFor(math.pow(10, e).toLong))
    assert(bs === bs.sorted)
    // q44's shipped geometry is the derived one for its corpus regime
    assert(Banding.keyWidthBits(4) === 16)
  }

  test("candidate-pair budget: clustered 10^5-hash corpus stays linear at derived B") {
    // 20k clusters x 5 members (base + 4 near-dups at hd<=3): a dup-heavy
    // web corpus in miniature. Derived B for N=100k is 4 (16-bit keys).
    val bases = hashes(20000, 0x5ca1eL)
    val corpus = bases.zipWithIndex.flatMap { case (x, i) =>
      x +: IndexedSeq.tabulate(4)(j => perturb(x, i * 7919L + j))
    }
    val n = corpus.size
    val blocks = Banding.blocksFor(n.toLong)
    assert(blocks === 4)
    val occ = scala.collection.mutable.HashMap.empty[(Int, Long), Int]
    corpus.foreach(h => Banding.tableKeys(h, blocks).foreach(k =>
      occ.update(k, occ.getOrElse(k, 0) + 1)))
    val candPairs = occ.valuesIterator.map(c => c.toLong * (c - 1) / 2).sum
    val maxBucket = occ.valuesIterator.max
    // linear budget: <= 50 pairs per input row (true cluster pairs plus
    // random 16-bit collisions); a quadratic blowup would be ~N^2/2^16 per
    // table ~ 150k pairs per ROW at this N if keys were 0-bit
    assert(candPairs <= 50L * n, s"candidate pairs $candPairs exceed 50x corpus size $n")
    assert(maxBucket <= 64, s"hot bucket of $maxBucket rows")
  }

  test("hyperplane plane count tracks vector corpus size; occupancy bounded at 10^5") {
    assert(Banding.nPlanesFor(5000L, 32) === 8)   // q37's shipped value
    assert(Banding.nPlanesFor(100000L, 32) === 12)
    assert(Banding.nPlanesFor(10000000000L, 32) === 29)
    val ns = (4 to 12).map(e => Banding.nPlanesFor(math.pow(10, e).toLong))
    assert(ns === ns.sorted)

    // 10^5 uniform 64-dim vectors bucketed by the DERIVED 12 planes: mean
    // occupancy ~24, so the in-bucket NN scan is ~N * occupancy, not N^2
    val nVecs = 100000
    val dims = 64
    val planes = Banding.nPlanesFor(nVecs.toLong, 32)
    val planeVecs = Array.tabulate(planes, dims)((p, d) => Banding.planeSign(p, d))
    var h = 0xfeedL
    val occ = new Array[Int](1 << planes)
    var i = 0
    while (i < nVecs) {
      val v = new Array[Double](dims)
      var d = 0
      while (d < dims) {
        h = SimWeb.splitmix(h)
        v(d) = ((h & Long.MaxValue) % 2000 - 1000) / 1000.0
        d += 1
      }
      var bucket = 0
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var k = 0
        while (k < dims) { dot += v(k) * planeVecs(p)(k); k += 1 }
        bucket = (bucket << 1) | (if (dot >= 0) 1 else 0)
        p += 1
      }
      occ(bucket) += 1
      i += 1
    }
    val pairSum = occ.iterator.map(c => c.toLong * (c - 1) / 2).sum
    val mean = nVecs.toDouble / (1 << planes)
    // budget: pair work per row bounded by a small multiple of the target
    // occupancy (32), i.e. total pairs <= N * 4 * target
    assert(pairSum <= nVecs.toLong * 4 * 32,
      s"in-bucket pair budget blown: $pairSum")
    assert(occ.max <= mean * 8, s"hot bucket ${occ.max} vs mean $mean")
  }

  test("q29/q30 IVF quantizer: ~sqrt(N) cells, in-cell population bounded on real embeddings") {
    import org.apache.spark.sql.functions._
    assert(Banding.ivfPlanesFor(5000L) === 6)  // 64 cells ~ sqrt(5000)
    assert(Banding.ivfPlanesFor(1000000L) === 10) // 1024 cells ~ sqrt(1e6)
    // population per cell on the real corpus must stay within a small
    // multiple of the mean (no label-style few-giant-cells key); the cell
    // expression here is the same (plane seed 11) as the shipped q29/q30
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val planes = (0 until graft.queries.QueriesVector.IVF_PLANES).map(p =>
      (0 until 64).map(d => Banding.planeSign(p, d, seed = 11L)))
    val cells = emb.select(col("vec_id"),
      concat(planes.map { pl =>
        val plLit = array(pl.map(lit): _*)
        when(graft.plans.DotProduct(
          transform(col("embedding"), x => x.cast("double")), plLit) >= 0,
          lit("1")).otherwise(lit("0"))
      }: _*).as("cell"))
    val pops = cells.groupBy("cell").count().collect().map(_.getLong(1))
    val n = pops.sum.toDouble
    val meanPop = n / (1 << graft.queries.QueriesVector.IVF_PLANES)
    assert(pops.length > 16, s"quantizer collapsed to ${pops.length} cells")
    assert(pops.max <= meanPop * 8,
      s"hot cell ${pops.max} vs mean $meanPop — cell key won't scale")
  }
}
