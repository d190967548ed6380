package graft

import graft.gen.SimWeb

/** SQL surface: functions registered by graft.plans.GraftExtensions behave
  * identically to the Column API / plain-Scala canon. Uses the install()
  * path on the shared suite session — builder.withExtensions is silently
  * ignored by getOrCreate() when any session already exists in the JVM, so
  * a suite-local session would depend on suite ordering.
  */
class ExtensionsSpec extends SparkSpecBase {

  test("canon_url / url_host / product_code / graft_hash64 work from SQL") {
    graft.plans.GraftExtensions.install(spark)
    val rows = spark.sql(
      """SELECT
        |  canon_url('HTTPS://WWW.Shop.COM:443/vp/products/9?b=2&a=1#f',
        |            'https://base.com') AS c,
        |  canon_url('/vp/products/7', 'https://base.com') AS rel,
        |  url_host('http://X.com:80/a') AS h,
        |  product_code('https://h/vp/products/123?x=1') AS pc,
        |  graft_hash64('abc') AS hh
        |""".stripMargin).collect().head
    assert(rows.getString(0) ==
      SimWeb.canonScala("HTTPS://WWW.Shop.COM:443/vp/products/9?b=2&a=1#f", "https://base.com"))
    assert(rows.getString(1) == "https://base.com/vp/products/7")
    assert(rows.getString(2) == "x.com")
    assert(rows.getString(3) == "123")
    assert(rows.getLong(4) == graft.functions.CanonJvm.md5Long("abc"))
  }

  test("extract_urls works from SQL and matches the regex twin") {
    graft.plans.GraftExtensions.install(spark)
    val text = "see https://A.b:443/x#f and /vp/products/77 plus javascript:void(1)"
    val got = spark.sql(s"SELECT extract_urls('$text') AS us")
      .collect().head.getSeq[String](0)
    assert(got == SimWeb.extractRawScala(text))
  }
}
