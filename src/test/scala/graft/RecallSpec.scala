package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Canon, TextFns}

/** Independent recall gate for the two banded near-dup queries (advice
  * round 2): q26/q44 mirror their LSH/band blocking inside the DuckDB
  * oracle, so the driver gate compares identical SEMANTICS — a pair the
  * banding misses is missed by both engines and the hash still matches.
  * This spec compares the banded outputs against UNBLOCKED all-pairs
  * formulations built independently here (crossJoin + exact predicate), so
  * a recall regression in the band machinery fails a test instead of only
  * a docstring claim. sf0.01 (500 docs) keeps the all-pairs side cheap.
  *
  * For q44 the equality is exact by construction (Manku pigeonhole); for
  * q26 the 1-(1-J^4)^8 collision bound predicts ≥ 0.9998 recall at J=0.9 —
  * empirically 100% on this corpus, which is what the equality pins.
  */
class RecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("q26 banded word-set Jaccard == exact all-pairs (recall 100% at sf0.01)") {
    val banded = SparkEntry.queries("q26_dedup_ngram_jaccard")(spark, dir)
    // independent exact formulation: word-set hashes per doc, full
    // crossJoin, exact Jaccard >= 0.9 — no groups, no bands
    val w = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        sort_array(array_distinct(transform(TextFns.tokens(col("text")),
          t => pmod(Canon.md5Long(t), lit(TextFns.P))))).as("ws"))
      .filter(size(col("ws")) > 0)
    val exact = w.as("a").crossJoin(w.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.ws"), col("b.ws"))).cast("double") /
          size(array_union(col("a.ws"), col("b.ws")))).as("jacc"))
      .filter(col("jacc") >= 0.9)
      .select(col("doc_a"), col("doc_b"), round(col("jacc"), 6).as("jacc"))
    val got = rows(banded)
    val want = rows(exact)
    assert((want -- got).isEmpty,
      s"banding LOST ${(want -- got).size} true pairs: ${(want -- got).take(5)}")
    assert((got -- want).isEmpty,
      s"banding INVENTED ${(got -- want).size} pairs: ${(got -- want).take(5)}")
  }

  test("q44 banded SimHash pairs == exact all-pairs hamming scan (pigeonhole exactness)") {
    val banded = SparkEntry.queries("q44_dedup_simhash_pairs")(spark, dir)
    // independent exact side: reuse the oracle-checked q25 simhash values
    // (the gate under test is the PAIR machinery, not the hash), full
    // crossJoin, bit_count <= 3
    val sim = SparkEntry.queries("q25_dedup_simhash")(spark, dir)
    val exact = sim.as("a").crossJoin(sim.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("int").as("hd"))
      .filter(col("hd") <= graft.queries.QueriesText.HAMMING_MAX)
    val got = rows(banded)
    val want = rows(exact)
    assert(got === want,
      s"lost=${(want -- got).take(5)} invented=${(got -- want).take(5)}")
  }

  test("q46 (B=6 wide-key construction) output-identical to q44 (B=4)") {
    // two independent pigeonhole constructions over the same hashes must
    // produce the same hd<=3 pair set — B is a cost knob, never recall
    val b4 = rows(SparkEntry.queries("q44_dedup_simhash_pairs")(spark, dir))
    val b6 = rows(SparkEntry.queries("q46_dedup_simhash_b6")(spark, dir))
    assert(b4 === b6,
      s"constructions diverge: onlyB4=${(b4 -- b6).take(5)} onlyB6=${(b6 -- b4).take(5)}")
  }
}
