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

  test("native extractUrls == Java-regex findAll twin on adversarial and random texts") {
    import org.scalacheck.Gen
    import scala.jdk.CollectionConverters._
    val crafted = Seq(
      "", " ", "https://a.b/c", "xhttps://a.b/c", "httpss://x", "HTTPS://X#f?q",
      "http:// space", "https:// ", "see /vp/products/123 and /vp/products/ end",
      "/vp/products/12a", "a/vp/products/9", "https://h/vp/products/5?x=1 /vp/products/7",
      "HTTP://A HTTPs://b hTTps://c", "https://h\nnext /vp/products/00",
      "tab\thttps://t/xvert", "adjacent https://a https://b", "https://",
      "/vp/products/123/vp/products/456", "end with https://tail",
      "HTTPSS://x HTTPS://y", "http://\t", "https://ok\rhttp://also",
      "/vp/products/" + "9" * 30, "nested https://o/vp/products/1 bare")
    val fragment = Gen.oneOf(
      "https", "http", "HTTPS", "HTTP", "://", "/vp/products/", "123", "0",
      " ", "x", "?", "#", "/", ":", "\n", "\t", "s", "S", "p", "end")
    val randomText = Gen.listOf(fragment).map(_.mkString)
    val texts = crafted ++ Gen.listOfN(500, randomText).sample.get
    texts.foreach { t =>
      val native = graft.functions.CanonJvm.extractUrls(t).asScala.toList
      val regex = SimWeb.extractRawScala(t).toList
      assert(native == regex, s"extract mismatch for '$t': native=$native regex=$regex")
    }
  }

  test("native extractUrls expression matches regexp_extract_all in a Spark plan") {
    import spark.implicits._
    val texts = Seq(
      "see https://A.b:443/x#f and /vp/products/77 plus javascript:void(1)",
      "bare /vp/products/ then HTTP://UP/low", "nothing here", "")
    val df = texts.toDF("text")
    val nat = df.select(explode(graft.plans.UrlExprs.extractUrls(col("text"))).as("u"))
      .as[String].collect().toSeq
    val reg = df.select(explode(
      regexp_extract_all(col("text"), lit(SimWeb.urlRegex), lit(0))).as("u"))
      .as[String].collect().toSeq
    assert(nat == reg)
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
