package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon
import Registry.{tbl, duckMd5Long}

/** Second wave of reference-surface coverage: container dispatch (S4),
  * the full review-record projection (P1/P2 + X9 + A6 + note N4), paging
  * caps (F5/W6), the product_code type divergence (X13/N3), and the
  * batched-sink chunking shape (K1 + W5's 10-per-chunk model).
  */
object QueriesCrawl2 {

  /** S4 — schema-variant container dispatch: probe layout A, fall back to
    * layout B (reference: #sdpReview vs btfTab probe,
    * crawling_review.py:358-361). Even docs render layout A, odd docs
    * layout B; the extractor must not care.
    */
  private val q31 = Q("q31_s4_fallback_dispatch",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      val page = tbl(s, dir, "documents").select(c,
        when(c % 2 === 0,
          concat(lit("<A rating='"), str(c % 5), lit("'/>")))
          .otherwise(concat(lit("<B score=\""), str(c % 7), lit("\"/>")))
          .as("html"))
      page.select(c,
        coalesce(
          when(regexp_extract(col("html"), "<A rating='([0-9]+)'", 1) =!= "",
            regexp_extract(col("html"), "<A rating='([0-9]+)'", 1)),
          when(regexp_extract(col("html"), "<B score=\"([0-9]+)\"", 1) =!= "",
            regexp_extract(col("html"), "<B score=\"([0-9]+)\"", 1)),
          lit("none")).as("rating"),
        when(col("html").contains("<A "), lit("layoutA"))
          .otherwise(lit("layoutB")).as("layout"))
        .orderBy("doc_id")
    },
    Some(
      """WITH page AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN '<A rating='''||(doc_id%5)::VARCHAR||'''/>'
        |       ELSE '<B score="'||(doc_id%7)::VARCHAR||'"/>' END AS html
        |  FROM documents)
        |SELECT doc_id,
        |  coalesce(
        |    CASE WHEN regexp_extract(html, '<A rating=''([0-9]+)''', 1) != ''
        |         THEN regexp_extract(html, '<A rating=''([0-9]+)''', 1) END,
        |    CASE WHEN regexp_extract(html, '<B score="([0-9]+)"', 1) != ''
        |         THEN regexp_extract(html, '<B score="([0-9]+)"', 1) END,
        |    'none') AS rating,
        |  CASE WHEN html LIKE '%<A %' THEN 'layoutA' ELSE 'layoutB' END AS layout
        |FROM page ORDER BY doc_id""".stripMargin))

  /** P1/P2 — the full review-out record (FIXTURES B5 shape, flattened):
    * product fields assembled with per-field failure defaults (reference
    * try/except per field, crawling_review.py:246-348; note N4: missing
    * help element ⇒ null review_id, row kept), breadcrumb concat (X9),
    * keyword map serialized sorted (A6), star rating (X5).
    */
  private val q32 = Q("q32_p1_p2_review_record",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      val prod = tbl(s, dir, "documents").select(c,
        ((c * 37) % 100000).as("product_code"),
        concat(lit("item "), str(c)).as("title"),
        // every 7th product: breadcrumb extraction "failed" → absent (null)
        when(c % 7 === 0, lit(null).cast("string"))
          .otherwise(Canon.categoryConcat(
            array(lit("root"), concat(lit("cat"), str(c % 5)),
              concat(lit("sub"), str(c % 11))))).as("tag"),
        when(c % 5 === 0, lit(null).cast("double"))
          .otherwise(round(((c * 19) % 101).cast("double") / 20.0, 2))
          .as("star_rating"),
        ((c * 3) % 500).as("review_count"),
        (lit(1000) + (c * 7) % 9000).as("sales_price"),
        (lit(500) + (c * 7) % 9000).as("final_price"))
      prod.select(
        lit("job_r1").as("job_id"), col("product_code"), col("title"),
        col("tag"), col("star_rating"), col("review_count"),
        col("sales_price"), col("final_price"),
        // N4: unbound review id in the reference escapes as an error; here a
        // null id with the row kept
        when(c % 13 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("rev-"), str(c))).as("review_id"),
        str((c * 19) % 101).as("review_rating"),
        concat(lit("kw"), str(c % 3), lit("=tag"), str(c % 3), lit(";kw"),
          str(c % 3 + 3), lit("=tag"), str(c % 3 + 3)).as("review_keywords"))
        .orderBy("product_code")
    },
    Some(
      """SELECT 'job_r1' AS job_id,
        |  (doc_id*37)%100000 AS product_code,
        |  'item '||doc_id::VARCHAR AS title,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |       ELSE 'cat'||(doc_id%5)::VARCHAR||','||'sub'||(doc_id%11)::VARCHAR END AS tag,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE round(((doc_id*19)%101)/20, 2) END AS star_rating,
        |  (doc_id*3)%500 AS review_count,
        |  1000+(doc_id*7)%9000 AS sales_price,
        |  500+(doc_id*7)%9000 AS final_price,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'rev-'||doc_id::VARCHAR END AS review_id,
        |  ((doc_id*19)%101)::VARCHAR AS review_rating,
        |  'kw'||(doc_id%3)::VARCHAR||'=tag'||(doc_id%3)::VARCHAR||';kw'||(doc_id%3+3)::VARCHAR||'=tag'||(doc_id%3+3)::VARCHAR AS review_keywords
        |FROM documents ORDER BY product_code""".stripMargin))

  /** F5/W6 — paging stop conditions: per-host page cursor capped by both a
    * depth limit (max_loop, crawling_review.py:389-391) and a
    * disabled-next-button predicate (125-129), expressed as frontier-state
    * filters + per-host surviving-page counts.
    */
  private val q33 = Q("q33_f5_w6_depth_cap",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      val frontier = tbl(s, dir, "documents").select(c,
        concat(lit("shop"), str(c % 7), lit(".com")).as("host"),
        (c % 12).cast("int").as("depth"),
        // "next disabled" when the page index hash says so
        (pmod(Canon.md5Long(str(c)), lit(5L)) === 0L).as("next_disabled"))
      frontier
        .filter(col("depth") < 8 && !col("next_disabled"))
        .groupBy("host")
        .agg(count(lit(1)).as("n_live"), max("depth").as("max_depth"))
        .orderBy("host")
    },
    Some(
      s"""WITH f AS (SELECT doc_id,
         |  'shop'||(doc_id%7)::VARCHAR||'.com' AS host,
         |  (doc_id%12)::INT AS depth,
         |  (${duckMd5Long("doc_id::VARCHAR")} % 5 = 0) AS next_disabled
         |  FROM documents)
         |SELECT host, count(*) AS n_live, max(depth) AS max_depth
         |FROM f WHERE depth < 8 AND NOT next_disabled
         |GROUP BY host ORDER BY host""".stripMargin))

  /** X13/N3 — product_code type divergence: the listing path keeps the code
    * as a string, the review path casts to int (null on garbage under
    * lenient casts — the reference raises and defaults instead).
    */
  private val q34 = Q("q34_x13_code_divergence",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      val urls = tbl(s, dir, "documents").select(c,
        when(c % 9 === 0,
          concat(lit("https://h/vp/products/promo-"), str(c)))
          .otherwise(concat(lit("https://h/vp/products/"), str((c * 37) % 100000)))
          .as("url"))
      urls.select(c,
        Canon.productCode(col("url")).as("code_str"),
        Canon.productCode(col("url")).cast("long").as("code_long"))
        .orderBy("doc_id")
    },
    Some(
      """WITH u AS (SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN 'https://h/vp/products/promo-'||doc_id::VARCHAR
        |       ELSE 'https://h/vp/products/'||((doc_id*37)%100000)::VARCHAR END AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, 'products/([^?#/]+)', 1) AS code_str,
        |  try_cast(regexp_extract(url, 'products/([^?#/]+)', 1) AS BIGINT) AS code_long
        |FROM u ORDER BY doc_id""".stripMargin))

  /** K1 + W5 — batched sink chunking: records grouped into chunks of 10 per
    * host in priority order (the reference's page_divide × 10-pages model,
    * crawling_multi.py:48-61; per-record Kafka POSTs become per-batch
    * appends).
    */
  private val q35 = Q("q35_k1_w5_batch_chunks",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      val recs = tbl(s, dir, "documents").select(c,
        concat(lit("shop"), str(c % 7), lit(".com")).as("host"))
      val w = Window.partitionBy("host").orderBy(col("doc_id").asc)
      recs.withColumn("rank", row_number().over(w))
        .withColumn("chunk", ((col("rank") - 1) / 10).cast("long"))
        .groupBy("host", "chunk")
        .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .orderBy("host", "chunk")
    },
    Some(
      """WITH r AS (SELECT doc_id, 'shop'||(doc_id%7)::VARCHAR||'.com' AS host FROM documents),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY host ORDER BY doc_id ASC) AS rank FROM r)
        |SELECT host, ((rank-1)//10)::BIGINT AS chunk, count(*) AS n,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM ranked GROUP BY host, chunk ORDER BY host, chunk""".stripMargin))

  val qs: Seq[Q] = Seq(q31, q32, q33, q34, q35)
}
