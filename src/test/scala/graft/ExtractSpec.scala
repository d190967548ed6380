package graft

import org.apache.spark.sql.functions._
import graft.gen.SimWeb
import graft.model.{Doc, Span}
import graft.operators.Extract

/** Span-invariant + extraction tests (SURVEY.md §5.2-4, input_hint):
  * per-row span-sequence equality on (kind, text, media_ref, order) after a
  * parquet round-trip, and Spark extraction == the oracle's sequential
  * extraction over the same simulated pages.
  */
class ExtractSpec extends SparkSpecBase {

  private val seed = 42L
  private val nHosts = 12

  private def sampleDocs: Seq[Doc] =
    SimWeb.seedUrls(50, nHosts, seed).distinct.map(u =>
      SimWeb.docFor(SimWeb.canonScala(u, "https://x"), seed, nHosts))

  test("span sequences survive a parquet round-trip exactly (kind, text, media_ref, order)") {
    import spark.implicits._
    val docs = sampleDocs
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDS().write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Doc].collect()
      .map(d => d.doc_id -> d).toMap
    docs.foreach { d =>
      val b = back(d.doc_id)
      assert(b.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)),
        s"span sequence mismatch for ${d.doc_id}")
    }
    // offsets strictly increasing = the order invariant is representable
    docs.foreach(d => assert(d.spans.map(_.offset) == d.spans.map(_.offset).sorted))
  }

  test("Spark candidate extraction equals sequential extraction") {
    import spark.implicits._
    val docs = sampleDocs
    val df = docs.toDS().toDF()
    val viaSpark = Extract.candidates(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaScala = docs.flatMap(d =>
      d.spans.filter(_.kind == "text")
        .flatMap(sp => SimWeb.extractRawScala(sp.text)).map(u => (d.doc_id, u))).toSet
    assert(viaSpark == viaScala)
  }

  test("canonCandidates: canonical, http-only, per-page base resolution, distinct") {
    import spark.implicits._
    val docs = sampleDocs
    val got = Extract.canonCandidates(docs.toDS().toDF())
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = docs.flatMap { d =>
      val base = "https://" + SimWeb.hostOfCanon(d.doc_id)
      d.spans.filter(_.kind == "text").flatMap(sp =>
        SimWeb.extractRawScala(sp.text).map(SimWeb.canonScala(_, base)))
        .filter(_.startsWith("http"))
        .map(c => (c, SimWeb.hostOfCanon(c), d.doc_id))
    }.toSet
    assert(got == want)
  }
}
