package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Registry.tbl

/** Relational analogs of the reference's enrichment/aggregation surface
  * (SURVEY.md §2.3/§2.5/§2.6) on the TPC-H-ish tables. Double sums are
  * routed through DECIMAL(18,2) so Spark's partition-order-dependent double
  * addition cannot diverge from the sequential DuckDB oracle.
  */
object QueriesRelational {

  /** J1: product→review enrichment = 1:N broadcast hash join
    * (reference: product_dict.copy() per review, crawling_review.py:400,440).
    * customer is the small dimension → broadcast().
    */
  private val q11 = Q("q11_j1_enrich_bhj",
    (s, dir) => {
      val orders = tbl(s, dir, "orders")
        .filter(col("o_orderkey") % 10 === 0)
      val cust = tbl(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
          col("c_nationkey"), round(col("o_totalprice"), 2).as("total"),
          col("o_orderstatus"))
        .orderBy("o_orderkey")
    },
    Some(
      """SELECT o_orderkey, c_name, c_mktsegment, c_nationkey,
        |  round(o_totalprice, 2) AS total, o_orderstatus
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin))

  /** A1/A3: worker-count sums + conditional success/fail tallies
    * (reference: crawling_multi.py:63,78; crawling_info_list.py:135-137).
    */
  private val q12 = Q("q12_a1_a3_counters",
    (s, dir) => tbl(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("o_custkey").as("n_cust"),
        sum(round(col("o_totalprice"), 2).cast("decimal(18,2)"))
          .cast("double").as("total"),
        sum(when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L))
          .as("n_urgent"))
      .orderBy("o_orderstatus"),
    Some(
      """SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
        |  sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS total,
        |  sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END)::BIGINT AS n_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** A5: ordered content concatenation per group (reference: review content
    * rows joined with ' ', crawling_review.py:408-417). Spark's collect_list
    * is partition-order nondeterministic, so sort the collected structs by
    * the (ts, event_id) total order before joining — the distributed
    * equivalent of the reference's sequential append.
    */
  private val q13 = Q("q13_a5_content_concat",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("user_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          " ").as("content"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id"),
    Some(
      """SELECT user_id,
        |  string_agg(event_type, ' ' ORDER BY ts, event_id) AS content,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** A6: keyword map build (reference: survey name→tag dict,
    * crawling_review.py:419-430), serialized as a sorted k=v string so the
    * map content is hash-comparable.
    */
  private val q14 = Q("q14_a6_keyword_map",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("event_type"), col("cnt")))),
          x => concat(x.getField("event_type"), lit("="),
            x.getField("cnt").cast("string"))),
        ";").as("keyword_map"))
      .orderBy("user_id"),
    Some(
      """WITH g AS (SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  string_agg(event_type||'='||cnt::VARCHAR, ';' ORDER BY event_type) AS keyword_map
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** F1 + W3/W4: threshold filter, latest-first sort, deterministic top-k
    * (reference: review_count >= 200 filter crawling_info_list.py:262-269;
    * max_links early exit 271-272).
    */
  private val q15 = Q("q15_f1_w4_topk",
    (s, dir) => tbl(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity"), 2).cast("decimal(18,2)"))
        .cast("double").as("qty"),
        count(lit(1)).as("n_items"))
      .filter(col("qty") >= 100.0)
      .orderBy(col("qty").desc, col("l_orderkey").asc)
      .limit(50),
    Some(
      """SELECT l_orderkey,
        |  sum(round(l_quantity, 2)::DECIMAL(18,2))::DOUBLE AS qty,
        |  count(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey HAVING qty >= 100.0
        |ORDER BY qty DESC, l_orderkey ASC LIMIT 50""".stripMargin))

  /** K2/T7: job-control summary rows — status done/fail with count==0 ⇒ fail
    * (reference: kafka_producer.py:58-80, crawling_multi.py:92-99).
    */
  private val q16 = Q("q16_k2_job_control",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("expected_count"))
      .select(
        concat(lit("job_"), col("event_type")).as("job_id"),
        when(col("expected_count") > 0, lit("done")).otherwise(lit("fail"))
          .as("status"),
        lit("collection").as("step"),
        col("expected_count"))
      .orderBy("job_id"),
    Some(
      """SELECT 'job_'||event_type AS job_id,
        |  CASE WHEN count(*) > 0 THEN 'done' ELSE 'fail' END AS status,
        |  'collection' AS step, count(*) AS expected_count
        |FROM events GROUP BY event_type ORDER BY job_id""".stripMargin))

  /** X11/X12: time-derived job ids + JSON record payloads
    * (reference: crawling_multi.py:13-15; kafka_producer.py:38-41).
    */
  private val q17 = Q("q17_x11_x12_payload",
    (s, dir) => tbl(s, dir, "events")
      .filter(col("event_id") < 20)
      .select(col("event_id"),
        concat(lit("job_"), date_format(col("ts"), "yyyyMMdd_HHmmss"))
          .as("job_id"),
        get_json_object(col("props"), "$.k").as("k"))
      .select(col("event_id"), col("job_id"),
        concat(lit("{\"records\":[{\"key\":\""), col("job_id"),
          lit("\",\"value\":{\"event_id\":"), col("event_id").cast("string"),
          lit(",\"k\":"), col("k"), lit("}}]}")).as("payload"))
      .orderBy("event_id"),
    Some(
      """WITH e AS (SELECT event_id,
        |  'job_'||strftime(ts, '%Y%m%d_%H%M%S') AS job_id,
        |  json_extract_string(props, '$.k') AS k
        |  FROM events WHERE event_id < 20)
        |SELECT event_id, job_id,
        |  '{"records":[{"key":"'||job_id||'","value":{"event_id":'||event_id::VARCHAR||',"k":'||k||'}}]}' AS payload
        |FROM e ORDER BY event_id""".stripMargin))

  val qs: Seq[Q] = Seq(q11, q12, q13, q14, q15, q16, q17)
}
