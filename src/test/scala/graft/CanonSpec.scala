package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import scala.util.chaining._
import graft.functions.Canon
import graft.gen.SimWeb

/** X14/X8/X1 property tests (SURVEY.md §5.2-2): idempotence, query-order
  * insensitivity, and — the load-bearing one — agreement between the Spark
  * Column pipeline and the independent plain-Scala reimplementation the
  * sequential oracle uses.
  */
class CanonSpec extends SparkSpecBase {

  private val base = "https://www.base.example.com"

  private val genHost: Gen[String] = for {
    name <- Gen.oneOf("shop0", "Shop1", "SHOP2.Sub", "a-b.c")
    tld <- Gen.oneOf("com", "org", "example.com")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
  } yield s"$name.$tld$port"

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    host <- genHost
    path <- Gen.oneOf("", "/", "/vp/products/123", "/a/b.html", "/search")
    q <- Gen.oneOf("", "?b=2&a=1", "?a=1", "?z=9&m=5&a=0")
    frag <- Gen.oneOf("", "#x", "#reviews")
    rel <- Gen.oneOf(true, false)
  } yield if (rel) s"$path$q$frag".pipe(s => if (s.startsWith("/")) s else "/" + s)
  else s"$scheme://$host$path$q$frag"

  private def sparkCanon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    val df = urls.toDF("url")
    Canon.canonicalize(df, "url", base)
      .select("canon_url").as[String].collect().toSeq
  }

  test("Column canon agrees with the oracle's plain-Scala canon") {
    val urls = Gen.listOfN(300, genUrl).sample.get
    val viaSpark = sparkCanon(urls)
    val viaScala = urls.map(SimWeb.canonScala(_, base))
    urls.lazyZip(viaSpark).lazyZip(viaScala).foreach { (u, a, b) =>
      assert(a == b, s"canon mismatch for '$u': spark='$a' scala='$b'")
    }
  }

  test("canon is idempotent: canon(canon(u)) == canon(u)") {
    val urls = Gen.listOfN(300, genUrl).sample.get
    val once = urls.map(SimWeb.canonScala(_, base))
    val twice = once.map(SimWeb.canonScala(_, base))
    assert(once == twice)
    val sparkOnce = sparkCanon(urls)
    val sparkTwice = sparkCanon(sparkOnce)
    assert(sparkOnce == sparkTwice)
  }

  test("canon is insensitive to query-parameter order") {
    val a = SimWeb.canonScala("https://h.com/p?b=2&a=1&c=3", base)
    val b = SimWeb.canonScala("https://h.com/p?c=3&a=1&b=2", base)
    assert(a == b)
  }

  test("default ports stripped only for the matching scheme") {
    assert(SimWeb.canonScala("http://h.com:80/x", base) == "http://h.com/x")
    assert(SimWeb.canonScala("https://h.com:443/x", base) == "https://h.com/x")
    assert(SimWeb.canonScala("http://h.com:443/x", base) == "http://h.com:443/x")
    assert(SimWeb.canonScala("https://h.com:8080/x", base) == "https://h.com:8080/x")
  }

  // ---- round 3: native one-pass expression vs the regex formulations ----

  /** Adversarial inputs for the native-vs-regex twin: degenerate schemes,
    * bare separators, surviving '#' after failed $ anchors, line
    * terminators around ports/fragments, non-ASCII letters (asciiLower must
    * leave them), unsorted/empty query params, multiple '?'.
    */
  private val adversarial: Seq[String] = Seq(
    "", "/", "?", "a", "://", ":///x", "http://", "https://",
    "https://h?", "https://h?&", "https://h?b&a&", "https://h?b=2&a=1&&",
    "foo?b&a", "/rel?z=1&a=2#f", "HtTp://Mixed.Case/Path",
    "ftp://h:80/x", "https://h:443", "https://h:443?q=1", "http://:80/x",
    "https://UPPER.HOST:8080/P?Q=v#F", "javascript:void(1)",
    "a+b-c.9://Host:443/p?x", "https://h/a://b?y&x", "https://h/p?",
    "https://h/p?#f", "scheme://", "http://h#f?notquery",
    "https://h/p?a=1?b=2", "x/y", "//proto-relative/x",
    "https://\u00c4B.com/\u00dcber?\u00e9=1&A=2", // non-ASCII: translate-only lower
    "https://h:80\n", "https://h:443\nx", "http://h:80\r\n",
    "https://h#frag\nrest", "https://h#a\nb#c", "https://h#t\u2028u",
    "https://h/p#", "#lead", "a#b#c", "https://h io?x", "Https://h/x")

  private def viaNative(urls: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    Canon.canonicalizeCol(urls.toDF("url"), "url", lit(base))
      .select("canon_url", "host").as[(String, String)].collect().toSeq
  }

  private def viaRegex(urls: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    Canon.canonicalizeColRegex(urls.toDF("url"), "url", lit(base))
      .select("canon_url", "host").as[(String, String)].collect().toSeq
  }

  test("native canon expression == staged regex pipeline on adversarial + generated inputs") {
    val urls = adversarial ++ Gen.listOfN(400, genUrl).sample.get
    val nat = viaNative(urls)
    val reg = viaRegex(urls)
    urls.lazyZip(nat).lazyZip(reg).foreach { (u, a, b) =>
      assert(a == b, s"native/regex canon mismatch for '$u': native=$a regex=$b")
    }
  }

  test("native canon expression == fused regex canonUrlCol (SQL-function form)") {
    import spark.implicits._
    val urls = adversarial ++ Gen.listOfN(200, genUrl).sample.get
    val df = urls.toDF("url")
    val both = df.select(
      Canon.canonUrlCol(col("url"), lit(base)).as("nat"),
      Canon.canonUrlColRegex(col("url"), lit(base)).as("reg"))
      .as[(String, String)].collect()
    both.zip(urls).foreach { case ((a, b), u) =>
      assert(a == b, s"mismatch for '$u': native=$a regex=$b")
    }
  }

  test("native canon null semantics mirror the when/otherwise chain") {
    import spark.implicits._
    // (url, base): null url -> null; relative url + null base -> null;
    // absolute url + null base -> canonicalized (base never consulted)
    val rows = Seq(
      (null: String, "https://b"),
      ("/rel", null: String),
      ("https://X.com:443/p?b=1&a=2", null: String))
    val got = rows.toDF("url", "b")
      .select(Canon.canonUrlCol(col("url"), col("b"))).as[String].collect().toSeq
    assert(got == Seq(null, null, "https://x.com/p?a=2&b=1"))
  }

  test("X1 product code mirrors the reference's split semantics") {
    import spark.implicits._
    // reference: url.split("products/")[-1].split("?")[0]
    // (src/api/crawling_info_list.py:57-59)
    val cases = Seq(
      "https://h/vp/products/123?x=1" -> "123",
      "https://h/vp/products/456" -> "456",
      "https://h/vp/products/789#f" -> "789")
    val got = cases.map(_._1).toDF("url")
      .select(Canon.productCode(col("url"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }
}
