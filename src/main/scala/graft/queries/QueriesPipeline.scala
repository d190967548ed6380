package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Canon
import Registry.tbl

/** The reference's `/info_list` entry point (SURVEY §3.3) composed
  * end-to-end as one declarative pipeline: item scan → URL pick (W1) →
  * product-code canon (X1) → cross-item dedup (D1) → thumbnail rewrite
  * (X2) → price fallback chain (X6/X7) → review-count filter (F1) →
  * price-present filter (F2) → deterministic top-k (W4). One query, one
  * oracle — the listing flow a reference user would run.
  */
object QueriesPipeline {

  private val q36 = Q("q36_info_list_pipeline",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: org.apache.spark.sql.Column) = x.cast("string")
      // 3 listing items per doc; product codes deliberately collide across
      // neighbouring docs (i*3+j formula) to exercise the dedup
      val items = tbl(s, dir, "documents").select(c,
        explode(sequence(lit(0), lit(2))).as("slot"))
        .select(c, col("slot"),
          ((c * 3 + col("slot")) % 600).as("code_num"))
      val listed = items.select(c, col("slot"),
        concat(lit("https://www.shop.com/vp/products/"), str(col("code_num")),
          lit("?itemId="), str(c)).as("url"),
        concat(lit("//img.cdn.net/remote/"), str(lit(100) + col("code_num") % 800),
          lit("x"), str(lit(100) + col("code_num") % 800), lit("/image/p"),
          str(col("code_num")), lit(".jpg")).as("img_raw"),
        concat(lit("sale\n"), str(lit(2000) + (col("code_num") * 13) % 8000),
          lit("원\n"), str(lit(1000) + (col("code_num") * 13) % 8000),
          lit("원\nend")).as("price_text"),
        ((col("code_num") * 7) % 500).as("review_count"))
      val prices = Canon.pricesKr(col("price_text"))
      val projected = listed.select(
        Canon.productCode(col("url")).as("product_code"),
        col("url"), col("doc_id"),
        Canon.thumbnailRewrite(col("img_raw")).as("img"),
        Canon.priceFallback(prices).getField("origin_price").as("origin_price"),
        Canon.priceFallback(prices).getField("final_price").as("final_price"),
        col("review_count"))
      // D1: first doc/url wins per product code (deterministic keeper)
      val w = Window.partitionBy("product_code")
        .orderBy(col("doc_id").asc, col("url").asc)
      projected.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .filter(col("review_count") >= 200 && col("final_price") > 0)
        .select("product_code", "url", "img", "origin_price", "final_price",
          "review_count")
        .orderBy(col("review_count").desc, col("product_code").asc)
        .limit(50)
    },
    Some(
      """WITH items AS (
        |  SELECT doc_id, unnest([0,1,2]) AS slot FROM documents),
        |coded AS (
        |  SELECT doc_id, slot, (doc_id*3+slot)%600 AS code_num FROM items),
        |listed AS (
        |  SELECT doc_id, slot,
        |    'https://www.shop.com/vp/products/'||code_num::VARCHAR||'?itemId='||doc_id::VARCHAR AS url,
        |    '//img.cdn.net/remote/'||(100+code_num%800)::VARCHAR||'x'||(100+code_num%800)::VARCHAR||'/image/p'||code_num::VARCHAR||'.jpg' AS img_raw,
        |    'sale'||chr(10)||(2000+(code_num*13)%8000)::VARCHAR||'원'||chr(10)||(1000+(code_num*13)%8000)::VARCHAR||'원'||chr(10)||'end' AS price_text,
        |    (code_num*7)%500 AS review_count
        |  FROM coded),
        |proj AS (
        |  SELECT
        |    regexp_extract(url, 'products/([^?#/]+)', 1) AS product_code,
        |    url, doc_id,
        |    regexp_replace(img_raw, '/remote/[^/]+/image', '/remote/292x292ex/image') AS img,
        |    list_transform(list_filter(string_split(price_text, chr(10)),
        |      x -> regexp_matches(x, '^[0-9][0-9,]*원$')),
        |      x -> try_cast(regexp_replace(x, '[^0-9]', '', 'g') AS BIGINT)) AS prices,
        |    review_count
        |  FROM listed),
        |priced AS (
        |  SELECT product_code, url, doc_id, img,
        |    CASE WHEN len(prices) >= 2 THEN prices[1] ELSE NULL END AS origin_price,
        |    CASE WHEN len(prices) >= 1 THEN prices[-1] ELSE 0 END AS final_price,
        |    review_count
        |  FROM proj),
        |deduped AS (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY product_code ORDER BY doc_id ASC, url ASC) AS rn
        |  FROM priced)
        |SELECT product_code, url, img, origin_price, final_price, review_count
        |FROM deduped
        |WHERE rn = 1 AND review_count >= 200 AND final_price > 0
        |ORDER BY review_count DESC, product_code ASC LIMIT 50""".stripMargin))

  val qs: Seq[Q] = Seq(q36)
}
