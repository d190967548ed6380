package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon
import Registry.{tbl, duckMd5Long}

/** Crawl-engine operator demos (SURVEY.md §2 ids in names), each with an
  * exact DuckDB oracle. Documents carry no URLs, so candidate URLs are
  * synthesized deterministically from doc_id — identically in Spark and in
  * the oracle SQL — covering the canonicalization edge cases (uppercase
  * host, default ports, fragments, unsorted query params, relative links,
  * non-http schemes, canon-equivalent duplicates).
  */
object QueriesCrawl {

  val base = "https://www.shop0.com"

  /** Five synthesized candidates per doc; pos 4 canonicalizes to the same
    * URL as pos 0 (exercises canon-dedup D1).
    */
  def synCandidates(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents").select("doc_id")
    val c = col("doc_id")
    def str(c: org.apache.spark.sql.Column) = c.cast("string")
    val u0 = d.select(c, lit(0).as("pos"),
      concat(lit("https://WWW.Shop"), str(c % 7), lit(".COM:443/vp/products/"),
        str((c * 37) % 100000), lit("?b=2&a=1")).as("url"))
    val u1 = d.select(c, lit(1).as("pos"),
      concat(lit("/vp/products/"), str((c * 13) % 100000)).as("url"))
    val u2 = d.select(c, lit(2).as("pos"),
      concat(lit("http://shop"), str(c % 7), lit(".com:80/search?q=w"),
        str(c % 50), lit("&page=2")).as("url"))
    val u3 = d.select(c, lit(3).as("pos"),
      concat(lit("javascript:void("), str(c), lit(")")).as("url"))
    val u4 = d.select(c, lit(4).as("pos"),
      concat(lit("https://www.shop"), str(c % 7), lit(".com/vp/products/"),
        str((c * 37) % 100000), lit("?a=1&b=2#top")).as("url"))
    u0.unionAll(u1).unionAll(u2).unionAll(u3).unionAll(u4)
  }

  /** DuckDB CTE mirroring synCandidates (named `syn`). */
  private val duckSyn: String =
    """syn AS (
      |  SELECT doc_id, 0 AS pos, 'https://WWW.Shop'||(doc_id%7)::VARCHAR||'.COM:443/vp/products/'||((doc_id*37)%100000)::VARCHAR||'?b=2&a=1' AS url FROM documents
      |  UNION ALL SELECT doc_id, 1 AS pos, '/vp/products/'||((doc_id*13)%100000)::VARCHAR AS url FROM documents
      |  UNION ALL SELECT doc_id, 2 AS pos, 'http://shop'||(doc_id%7)::VARCHAR||'.com:80/search?q=w'||(doc_id%50)::VARCHAR||'&page=2' AS url FROM documents
      |  UNION ALL SELECT doc_id, 3 AS pos, 'javascript:void('||doc_id::VARCHAR||')' AS url FROM documents
      |  UNION ALL SELECT doc_id, 4 AS pos, 'https://www.shop'||(doc_id%7)::VARCHAR||'.com/vp/products/'||((doc_id*37)%100000)::VARCHAR||'?a=1&b=2#top' AS url FROM documents
      |)""".stripMargin

  /** DuckDB CTE chain mirroring Canon.canonUrl/urlHost applied to `url` of
    * CTE `src`; emits CTE `canoned` with added columns canon_url + host.
    */
  private def duckCanonCtes(src: String): String =
    s"""_c1 AS (SELECT *, CASE WHEN url LIKE '/%' THEN '$base'||url ELSE url END AS _abs FROM $src),
       |_c2 AS (SELECT *, regexp_replace(_abs, '#.*$$', '') AS _nf FROM _c1),
       |_c3 AS (SELECT *,
       |  lower(regexp_extract(_nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS _scheme,
       |  lower(regexp_extract(_nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS _hp,
       |  regexp_extract(_nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS _p0,
       |  regexp_extract(_nf, '\\?([^#]*)', 1) AS _q FROM _c2),
       |_c4 AS (SELECT *,
       |  CASE WHEN _scheme='http' THEN regexp_replace(_hp, ':80$$', '')
       |       WHEN _scheme='https' THEN regexp_replace(_hp, ':443$$', '')
       |       ELSE _hp END AS host,
       |  CASE WHEN _p0='' THEN '/' ELSE _p0 END AS _path FROM _c3),
       |canoned AS (SELECT *, _scheme||'://'||host||_path||
       |  CASE WHEN _q='' THEN '' ELSE '?'||array_to_string(list_sort(string_split(_q,'&')),'&') END AS canon_url
       |  FROM _c4)""".stripMargin

  /** Spark twin of duckCanonCtes: adds canon_url + host to a df with `url`. */
  private def withCanon(df: DataFrame): DataFrame =
    Canon.canonicalize(df, "url", base)

  // ---------------------------------------------------------------- queries

  /** X14+X8: full canonicalization of every synthesized candidate. */
  private val q01 = Q("q01_x14_canon_url",
    (s, dir) => withCanon(synCandidates(s, dir))
      .select("doc_id", "pos", "url", "canon_url", "host")
      .orderBy("doc_id", "pos"),
    Some(
      s"""WITH $duckSyn,
         |${duckCanonCtes("syn")}
         |SELECT doc_id, pos, url, canon_url, host FROM canoned
         |ORDER BY doc_id, pos""".stripMargin))

  /** D2/S2: URL-candidate extraction from span text via regexp_extract_all
    * + explode + per-doc distinct (reference: per-item anchor iteration,
    * crawling_info_list.py:12-24).
    */
  private def synText(s: SparkSession, dir: String): DataFrame = {
    val c = col("doc_id")
    def str(x: org.apache.spark.sql.Column) = x.cast("string")
    tbl(s, dir, "documents").select(c,
      concat(lit("see https://www.shop"), str(c % 7), lit(".com/vp/products/"),
        str((c * 37) % 100000), lit(" and /vp/products/"), str((c * 13) % 100000),
        lit(" plus http://shop"), str(c % 7), lit(".com/search?q=w"), str(c % 50),
        lit(" end")).as("text2"))
  }

  private val duckSynText: String =
    """txt AS (SELECT doc_id,
      |  'see https://www.shop'||(doc_id%7)::VARCHAR||'.com/vp/products/'||((doc_id*37)%100000)::VARCHAR||
      |  ' and /vp/products/'||((doc_id*13)%100000)::VARCHAR||
      |  ' plus http://shop'||(doc_id%7)::VARCHAR||'.com/search?q=w'||(doc_id%50)::VARCHAR||' end' AS text2
      |  FROM documents)""".stripMargin

  private val urlRx = "https?://[^\\s]+|/vp/products/[0-9]+"

  private val q02 = Q("q02_d2_extract_urls",
    (s, dir) => synText(s, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text2"), lit(urlRx), lit(0))).as("url"))
      .distinct()
      .orderBy("doc_id", "url"),
    Some(
      s"""WITH $duckSynText
         |SELECT DISTINCT doc_id, unnest(regexp_extract_all(text2, '$urlRx')) AS url
         |FROM txt ORDER BY doc_id, url""".stripMargin))

  /** W1: top-1 candidate per doc preferring /vp/products/ URLs
    * (reference: crawling_info_list.py:30-31); rewritten by Spark ≥3.5 into
    * WindowGroupLimit (no full sort per group).
    */
  private val q03 = Q("q03_w1_priority_pick",
    (s, dir) => {
      val cand = synText(s, dir)
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text2"), lit(urlRx), lit(0))).as("url"))
        .distinct()
        .withColumn("is_product", Canon.isProductUrl(col("url")).cast("int"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("is_product").desc, col("url").asc)
      cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "url", "is_product")
        .orderBy("doc_id")
    },
    Some(
      s"""WITH $duckSynText,
         |cand AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all(text2, '$urlRx')) AS url FROM txt),
         |flagged AS (SELECT doc_id, url,
         |  CASE WHEN url LIKE '%/vp/products/%' THEN 1 ELSE 0 END AS is_product FROM cand),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY is_product DESC, url ASC) AS rn FROM flagged)
         |SELECT doc_id, url, is_product FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin))

  /** D1: dedup by canonical equivalence — pos 0 and pos 4 collapse. */
  private val q04 = Q("q04_d1_dedup_canon",
    (s, dir) => withCanon(synCandidates(s, dir))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_variants"), min("url").as("first_url"),
        min("doc_id").as("first_doc"))
      .orderBy("canon_url"),
    Some(
      s"""WITH $duckSyn,
         |${duckCanonCtes("syn")}
         |SELECT canon_url, count(*) AS n_variants, min(url) AS first_url,
         |  min(doc_id) AS first_doc
         |FROM canoned GROUP BY canon_url ORDER BY canon_url""".stripMargin))

  /** J2: seen-set anti join — candidates whose canon_url is NOT in the seen
    * set (canon of pos-0 candidates of every third doc).
    */
  private val q05 = Q("q05_j2_seen_anti_join",
    (s, dir) => {
      val cand = withCanon(synCandidates(s, dir))
        .select("doc_id", "canon_url").distinct()
      val seen = withCanon(synCandidates(s, dir))
        .filter(col("pos") === 0 && col("doc_id") % 3 === 0)
        .select("canon_url").distinct()
      cand.join(seen, Seq("canon_url"), "left_anti")
        .groupBy("canon_url")
        .agg(min("doc_id").as("first_doc"), count(lit(1)).as("n_docs"))
        .orderBy("canon_url")
    },
    Some(
      s"""WITH $duckSyn,
         |${duckCanonCtes("syn")},
         |cand AS (SELECT DISTINCT doc_id, canon_url FROM canoned),
         |seen AS (SELECT DISTINCT canon_url FROM canoned WHERE pos = 0 AND doc_id % 3 = 0)
         |SELECT canon_url, min(doc_id) AS first_doc, count(*) AS n_docs
         |FROM cand WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.canon_url = cand.canon_url)
         |GROUP BY canon_url ORDER BY canon_url""".stripMargin))

  /** Synthetic frontier used by the scheduling queries. */
  private def synFrontier(s: SparkSession, dir: String): DataFrame = {
    val c = col("doc_id")
    def str(x: org.apache.spark.sql.Column) = x.cast("string")
    tbl(s, dir, "documents").select(c,
      concat(lit("shop"), str(c % 7), lit(".com")).as("host"),
      concat(lit("https://shop"), str(c % 7), lit(".com/vp/products/"), str(c))
        .as("canon_url"),
      (c % 5).cast("int").as("depth"),
      (((c * 17) % 100) / lit(10.0)).as("score"))
  }

  private val duckFrontier: String =
    """front AS (SELECT doc_id,
      |  'shop'||(doc_id%7)::VARCHAR||'.com' AS host,
      |  'https://shop'||(doc_id%7)::VARCHAR||'.com/vp/products/'||doc_id::VARCHAR AS canon_url,
      |  (doc_id%5)::INT AS depth,
      |  ((doc_id*17)%100)/10.0 AS score
      |  FROM documents)""".stripMargin

  /** W2: priority-queue scheduling as a Catalyst window rank — per-host
    * row_number by (score desc, depth asc, canon_url asc), batch cap 8.
    */
  private val q06 = Q("q06_w2_sched_rank",
    (s, dir) => {
      val w = Window.partitionBy("host")
        .orderBy(col("score").desc, col("depth").asc, col("canon_url").asc)
      synFrontier(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 8)
        .select("host", "canon_url", "depth", "score", "rank")
        .orderBy("host", "rank")
    },
    Some(
      s"""WITH $duckFrontier,
         |ranked AS (SELECT *, row_number() OVER
         |  (PARTITION BY host ORDER BY score DESC, depth ASC, canon_url ASC) AS rank
         |  FROM front)
         |SELECT host, canon_url, depth, score, rank FROM ranked
         |WHERE rank <= 8 ORDER BY host, rank""".stripMargin))

  /** T4: token-bucket politeness in virtual time — per-host cumulative fetch
    * cost (window running sum in priority order) capped by an epoch budget.
    */
  private val q07 = Q("q07_t4_politeness_budget",
    (s, dir) => {
      val ord = Window.partitionBy("host")
        .orderBy(col("score").desc, col("depth").asc, col("canon_url").asc)
      synFrontier(s, dir)
        .withColumn("cost_ms", lit(1000L) + pmod(Canon.md5Long(col("canon_url")), lit(3000L)))
        .withColumn("rank", row_number().over(ord))
        .withColumn("cum_ms", sum("cost_ms").over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_ms") <= 12000L)
        .select("host", "canon_url", "rank", "cost_ms", "cum_ms")
        .orderBy("host", "rank")
    },
    Some(
      s"""WITH $duckFrontier,
         |costed AS (SELECT *, 1000 + (${duckMd5Long("canon_url")} % 3000) AS cost_ms FROM front),
         |ranked AS (SELECT *,
         |  row_number() OVER (PARTITION BY host ORDER BY score DESC, depth ASC, canon_url ASC) AS rank,
         |  (sum(cost_ms) OVER (PARTITION BY host ORDER BY score DESC, depth ASC, canon_url ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_ms
         |  FROM costed)
         |SELECT host, canon_url, rank, cost_ms, cum_ms FROM ranked
         |WHERE cum_ms <= 12000 ORDER BY host, rank""".stripMargin))

  /** W5: salted host-hash partition histogram — hot hosts spread over salt
    * buckets; partition ids derive from the portable md5 hash so the oracle
    * reproduces the exact assignment.
    */
  private val q08 = Q("q08_w5_salt_histogram",
    (s, dir) => synFrontier(s, dir)
      .withColumn("salt", pmod(Canon.md5Long(col("canon_url")), lit(8L)))
      .withColumn("part",
        pmod(Canon.md5Long(concat(col("host"), lit("#"), col("salt").cast("string"))), lit(32L)))
      .groupBy("part")
      .agg(count(lit(1)).as("n"), countDistinct("host").as("n_hosts"))
      .orderBy("part"),
    Some(
      s"""WITH $duckFrontier,
         |salted AS (SELECT *, ${duckMd5Long("canon_url")} % 8 AS salt FROM front),
         |parted AS (SELECT *, ${duckMd5Long("host||'#'||salt::VARCHAR")} % 32 AS part FROM salted)
         |SELECT part, count(*) AS n, count(DISTINCT host) AS n_hosts
         |FROM parted GROUP BY part ORDER BY part""".stripMargin))

  /** X1/X2/X8 scalar extraction trio. */
  private val q09 = Q("q09_x1_x2_x8_scalars",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      tbl(s, dir, "documents").select(c,
        concat(lit("https://www.shop.com/vp/products/"), str((c * 37) % 100000),
          lit("?itemId="), str(c)).as("purl"),
        concat(lit("https://img.cdn"), str(c % 3), lit(".net/remote/"),
          str(lit(100) + c % 900), lit("x"), str(lit(100) + c % 900), lit("/image/item"),
          str(c), lit(".jpg")).as("img"),
        concat(lit("/dp/"), str(c)).as("rel"))
        .select(c,
          Canon.productCode(col("purl")).as("product_code"),
          Canon.thumbnailRewrite(col("img")).as("img_canon"),
          Canon.absUrl(col("rel"), base).as("abs_url"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH d AS (SELECT doc_id,
         |  'https://www.shop.com/vp/products/'||((doc_id*37)%100000)::VARCHAR||'?itemId='||doc_id::VARCHAR AS purl,
         |  'https://img.cdn'||(doc_id%3)::VARCHAR||'.net/remote/'||(100+doc_id%900)::VARCHAR||'x'||(100+doc_id%900)::VARCHAR||'/image/item'||doc_id::VARCHAR||'.jpg' AS img,
         |  '/dp/'||doc_id::VARCHAR AS rel FROM documents)
         |SELECT doc_id,
         |  regexp_extract(purl, 'products/([^?#/]+)', 1) AS product_code,
         |  regexp_replace(img, '/remote/[^/]+/image', '/remote/292x292ex/image') AS img_canon,
         |  CASE WHEN rel LIKE '/%' THEN '$base'||rel ELSE rel END AS abs_url
         |FROM d ORDER BY doc_id""".stripMargin))

  /** X3/X4/X5/X6/X7: numeric extraction + Korean price lines + fallback
    * chain (origin = first match, final = last — SURVEY note N1) + the
    * lenient-vs-strict divergence (note N2: every 10th doc has no digits,
    * lenient→0, strict→null).
    */
  private val q10 = Q("q10_x3_x6_prices",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      val raw = tbl(s, dir, "documents").select(c,
        when(c % 10 === 0, lit("no digits here"))
          .otherwise(concat(lit("리뷰 "), str(c % 1000), lit("개"))).as("cnt_s"),
        concat(lit("width: "), str(c % 101), lit("%")).as("style"),
        concat(lit("sale\n"), str(lit(1000) + (c * 7) % 9000), lit("원\n"),
          str(lit(1500) + (c * 7) % 9000), lit("원\nend")).as("price_text"))
      val prices = Canon.pricesKr(col("price_text"))
      raw.select(c,
        Canon.numInStrLenient(col("cnt_s")).as("n_lenient"),
        Canon.numInStrStrict(col("cnt_s")).as("n_strict"),
        Canon.starRating(col("style")).as("star"),
        array_join(transform(prices, _.cast("string")), ";").as("prices_s"),
        Canon.priceFallback(prices).getField("origin_price").as("origin_price"),
        Canon.priceFallback(prices).getField("final_price").as("final_price"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH d AS (SELECT doc_id,
         |  CASE WHEN doc_id % 10 = 0 THEN 'no digits here'
         |       ELSE '리뷰 '||(doc_id%1000)::VARCHAR||'개' END AS cnt_s,
         |  'width: '||(doc_id%101)::VARCHAR||'%' AS style,
         |  'sale'||chr(10)||(1000+(doc_id*7)%9000)::VARCHAR||'원'||chr(10)||
         |  (1500+(doc_id*7)%9000)::VARCHAR||'원'||chr(10)||'end' AS price_text
         |  FROM documents),
         |p AS (SELECT *, list_transform(
         |    list_filter(string_split(price_text, chr(10)), x -> regexp_matches(x, '^[0-9][0-9,]*원$$')),
         |    x -> try_cast(regexp_replace(x, '[^0-9]', '', 'g') AS BIGINT)) AS prices
         |  FROM d)
         |SELECT doc_id,
         |  coalesce(try_cast(regexp_replace(cnt_s, '[^0-9]', '', 'g') AS BIGINT), 0) AS n_lenient,
         |  try_cast(regexp_replace(cnt_s, '[^0-9]', '', 'g') AS BIGINT) AS n_strict,
         |  round(try_cast(regexp_replace(style, '[^0-9]', '', 'g') AS BIGINT)/20.0, 2) AS star,
         |  array_to_string(list_transform(prices, x -> x::VARCHAR), ';') AS prices_s,
         |  CASE WHEN len(prices) >= 2 THEN prices[1] ELSE NULL END AS origin_price,
         |  CASE WHEN len(prices) >= 1 THEN prices[-1] ELSE 0 END AS final_price
         |FROM p ORDER BY doc_id""".stripMargin))

  val qs: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10)
}
