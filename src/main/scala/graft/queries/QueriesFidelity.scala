package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Canon
import graft.gen.SimWeb
import Registry.tbl

/** Round-2 reference-fidelity queries (round-1 verdict "What's missing"):
  * the full 4-stage price fallback chain (X7), true latest-first ordering
  * (W3), the complete job-control record with failure_reason/completed_at
  * (K2), the KST ISO-8601 timestamp formatter (X10), and a REAL
  * interleaved-span table exercised through the S2/S3 extraction path with
  * a DuckDB unnest oracle (the BASELINE.json input_hint shape).
  */
object QueriesFidelity {

  // ---------------------------------------------------------------- q38 X7

  /** X7 — the reference's full price fallback chain
    * (/root/reference/src/api/crawling_info_list.py:185-226):
    *   1. direct price element text           (185-197)
    *   2. <del> strike-price element          (199-204; origin price source)
    *   3. price-line regex over the body — origin = FIRST match, final =
    *      LAST match; a single match is final only (207-214, note N1)
    *   4. last bare numeric token in the body (216-224)
    * with final_price defaulting to 0 and origin_price absent (null) when
    * every stage misses (229-231 guards). Synthesized per-doc presence
    * classes drive each stage (doc_id%5: 0=direct+del, 1=direct only,
    * 2=two regex lines, 3=one regex line, 4=bare token only; %10==9 ⇒
    * nothing at all).
    */
  private val q38 = Q("q38_x7_price_chain",
    (s, dir) => {
      val c = col("doc_id")
      def str(x: Column) = x.cast("string")
      val cls = c % 5
      val none = c % 10 === 9
      val raw = tbl(s, dir, "documents").select(c,
        when(cls === 0 || cls === 1,
          concat(str(lit(2000) + (c * 7) % 8000), lit("원"))).as("direct_txt"),
        when(cls === 0,
          concat(str(lit(3000) + (c * 7) % 8000), lit("원"))).as("del_txt"),
        when(none, lit("sold out"))
          .when(cls === 2, concat(lit("sale\n"), str(lit(1000) + (c * 11) % 9000),
            lit("원\n"), str(lit(1500) + (c * 11) % 9000), lit("원\nend")))
          .when(cls === 3, concat(lit("sale\n"), str(lit(1200) + (c * 11) % 9000),
            lit("원\nend")))
          .when(cls === 4, concat(lit("approx "), str(lit(900) + (c * 13) % 9000),
            lit(" left")))
          .otherwise(lit("no numbers here")).as("body"))
      val prices = Canon.pricesKr(col("body"))
      // stage 4: LAST bare numeric token of the body
      val bare = element_at(
        regexp_extract_all(col("body"), lit("[0-9][0-9,]*"), lit(0)), -1)
      raw.select(c,
        coalesce(
          Canon.numInStrStrict(col("direct_txt")),
          when(size(prices) >= 1, element_at(prices, -1)),
          Canon.numInStrStrict(bare),
          lit(0L)).as("final_price"),
        coalesce(
          Canon.numInStrStrict(col("del_txt")),
          when(size(prices) >= 2, element_at(prices, 1))).as("origin_price"))
        .orderBy("doc_id")
    },
    Some(
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id%5 IN (0,1) THEN (2000+(doc_id*7)%8000)::VARCHAR||'원' END AS direct_txt,
        |  CASE WHEN doc_id%5 = 0 THEN (3000+(doc_id*7)%8000)::VARCHAR||'원' END AS del_txt,
        |  CASE WHEN doc_id%10 = 9 THEN 'sold out'
        |       WHEN doc_id%5 = 2 THEN 'sale'||chr(10)||(1000+(doc_id*11)%9000)::VARCHAR||'원'||chr(10)||(1500+(doc_id*11)%9000)::VARCHAR||'원'||chr(10)||'end'
        |       WHEN doc_id%5 = 3 THEN 'sale'||chr(10)||(1200+(doc_id*11)%9000)::VARCHAR||'원'||chr(10)||'end'
        |       WHEN doc_id%5 = 4 THEN 'approx '||(900+(doc_id*13)%9000)::VARCHAR||' left'
        |       ELSE 'no numbers here' END AS body
        |  FROM documents),
        |p AS (SELECT *, list_transform(
        |    list_filter(string_split(body, chr(10)), x -> regexp_matches(x, '^[0-9][0-9,]*원$')),
        |    x -> try_cast(regexp_replace(x, '[^0-9]', '', 'g') AS BIGINT)) AS prices,
        |  regexp_extract_all(body, '[0-9][0-9,]*')[-1] AS bare
        |  FROM d)
        |SELECT doc_id,
        |  coalesce(try_cast(regexp_replace(direct_txt, '[^0-9]', '', 'g') AS BIGINT),
        |    CASE WHEN len(prices) >= 1 THEN prices[-1] END,
        |    try_cast(regexp_replace(bare, '[^0-9]', '', 'g') AS BIGINT),
        |    0) AS final_price,
        |  coalesce(try_cast(regexp_replace(del_txt, '[^0-9]', '', 'g') AS BIGINT),
        |    CASE WHEN len(prices) >= 2 THEN prices[1] END) AS origin_price
        |FROM p ORDER BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- q39 W3

  /** W3 — true latest-first ordering: the reference sorts reviews by date
    * descending before scraping (/root/reference/src/api/crawling_review
    * .py:363-373); round 1 proxied it with a quantity sort. Deterministic
    * tiebreak on event_id; ts serialized for a stable cross-engine compare.
    */
  private val q39 = Q("q39_w3_latest_first",
    (s, dir) => tbl(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("ts_s").desc, col("event_id").asc)
      .limit(100),
    Some(
      """SELECT event_id, user_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events ORDER BY ts_s DESC, event_id ASC LIMIT 100""".stripMargin))

  // ---------------------------------------------------------------- q40 K2

  /** K2 — the COMPLETE job-control record
    * (/root/reference/src/api/kafka_producer.py:58-80,91-99): job_id,
    * status done/fail (count==0 ⇒ fail), step, failure_reason (null on
    * done, fixed reason string on fail), expected_count, completed_at as a
    * KST ISO-8601 string (X10). A synthetic job with no events exercises
    * the fail path; completed_at = latest event time per job in virtual
    * time (N6), with a fixed virtual fallback for the empty job.
    */
  private val q40 = Q("q40_k2_job_control_full",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
      val jobs = ev.select(col("event_type")).distinct()
        .unionAll(s.range(1).select(lit("nothing_collected").as("event_type")))
      val counts = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("ts").as("last_ts"))
      jobs.join(counts, Seq("event_type"), "left")
        .select(
          concat(lit("job_"), col("event_type")).as("job_id"),
          when(coalesce(col("n"), lit(0L)) > 0, lit("done")).otherwise(lit("fail"))
            .as("status"),
          lit("collection").as("step"),
          when(coalesce(col("n"), lit(0L)) > 0, lit(null).cast("string"))
            .otherwise(lit("no records collected")).as("failure_reason"),
          coalesce(col("n"), lit(0L)).as("expected_count"),
          concat(date_format(
            coalesce(col("last_ts"), to_timestamp(lit("2024-01-01 00:00:00")))
              + expr("INTERVAL 9 HOURS"),
            "yyyy-MM-dd'T'HH:mm:ss"), lit("+09:00")).as("completed_at"))
        .orderBy("job_id")
    },
    Some(
      """WITH jobs AS (SELECT DISTINCT event_type FROM events
        |  UNION ALL SELECT 'nothing_collected'),
        |c AS (SELECT event_type, count(*) AS n, max(ts) AS last_ts
        |  FROM events GROUP BY event_type)
        |SELECT 'job_'||jobs.event_type AS job_id,
        |  CASE WHEN coalesce(n, 0) > 0 THEN 'done' ELSE 'fail' END AS status,
        |  'collection' AS step,
        |  CASE WHEN coalesce(n, 0) > 0 THEN NULL ELSE 'no records collected' END AS failure_reason,
        |  coalesce(n, 0) AS expected_count,
        |  strftime(coalesce(last_ts, TIMESTAMP '2024-01-01 00:00:00')
        |    + INTERVAL 9 HOUR, '%Y-%m-%dT%H:%M:%S')||'+09:00' AS completed_at
        |FROM jobs LEFT JOIN c USING (event_type) ORDER BY job_id""".stripMargin))

  // --------------------------------------------------------------- q41 X10

  /** X10 — KST timestamp formatting: ISO-8601 in Asia/Seoul rendered with
    * the reference's fixed +09:00 fallback offset (/root/reference/src/api/
    * crawling_review.py:25-32 — KST has no DST, so the fixed offset is
    * exact). Inputs are virtual event times (N6), never wall clock.
    */
  private val q41 = Q("q41_x10_kst_format",
    (s, dir) => tbl(s, dir, "events")
      .filter(col("event_id") < 200)
      .select(col("event_id"),
        concat(date_format(col("ts") + expr("INTERVAL 9 HOURS"),
          "yyyy-MM-dd'T'HH:mm:ss"), lit("+09:00")).as("crawled_at"),
        date_format(col("ts") + expr("INTERVAL 9 HOURS"), "yyyyMMdd_HHmmss")
          .as("kst_job_suffix"))
      .orderBy("event_id"),
    Some(
      """SELECT event_id,
        |  strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%dT%H:%M:%S')||'+09:00' AS crawled_at,
        |  strftime(ts + INTERVAL 9 HOUR, '%Y%m%d_%H%M%S') AS kst_job_suffix
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin))

  // ---------------------------------------------------------------- q45 K2

  /** K2 error path — send_crawling_error's message shape
    * (/root/reference/src/api/kafka_producer.py:83-102), distinct from the
    * count==0 fail that q40 covers: status is ALWAYS 'fail', failure_reason
    * is OPTIONAL (absent → null when no error message was supplied), and
    * there is NO expected_count field at all. One synthetic error job per
    * event_type (each "crashed" during collection); whether an error
    * message accompanied the crash is deterministic in the job name, and
    * completed_at is the job's last virtual event time in KST (X10).
    */
  private val q45 = Q("q45_k2_error_path",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type")
      .agg(max("ts").as("last_ts"))
      .select(
        concat(lit("job_"), col("event_type")).as("job_id"),
        lit("fail").as("status"),
        lit("collection").as("step"),
        when(length(col("event_type")) % 2 === 0,
          concat(lit("TimeoutException in "), col("event_type")))
          .otherwise(lit(null).cast("string")).as("failure_reason"),
        concat(date_format(col("last_ts") + expr("INTERVAL 9 HOURS"),
          "yyyy-MM-dd'T'HH:mm:ss"), lit("+09:00")).as("completed_at"))
      .orderBy("job_id"),
    Some(
      """SELECT 'job_'||event_type AS job_id,
        |  'fail' AS status,
        |  'collection' AS step,
        |  CASE WHEN length(event_type) % 2 = 0
        |    THEN 'TimeoutException in '||event_type END AS failure_reason,
        |  strftime(max(ts) + INTERVAL 9 HOUR, '%Y-%m-%dT%H:%M:%S')||'+09:00' AS completed_at
        |FROM events GROUP BY event_type ORDER BY job_id""".stripMargin))

  // ------------------------------------------------- q42/q43 spans fixture

  /** Deterministic interleaved-span fixture in the exact BASELINE.json
    * input_hint shape (doc_id, spans ARRAY<STRUCT<kind,text,media_ref,
    * offset>>), generated by the same SimWeb generator the engine crawls
    * (gen/SimWeb.scala docFor) and written to a fixed path both the Spark
    * query and the DuckDB oracle read — so S2/S3 extraction is verified on
    * REAL span rows, not doc_id-synthesized text.
    */
  // NOT under target/: an `sbt clean` between Verify and the driver's
  // DuckDB pass would otherwise delete the fixture the oracle SQL reads
  val spansFixturePath = "/root/.graft/fixtures/spans_oracle"
  private val FIX_SEED = 7L
  private val FIX_HOSTS = 20
  private val FIX_DOCS = 300

  /** Write-once via [[Fixtures.ensure]]: deterministic in (seed, hosts,
    * docs); the trailing version token must be bumped whenever
    * SimWeb.docFor / seedUrls change, or stale fixtures from older
    * generators would keep validating.
    */
  private val fixtureStamp = s"seed=$FIX_SEED hosts=$FIX_HOSTS docs=$FIX_DOCS v2"
  @volatile private var fixtureChecked = false

  private def ensureSpansFixture(s: SparkSession): Unit =
    if (!fixtureChecked) synchronized {
      Fixtures.ensure(spansFixturePath, fixtureStamp) { tmp =>
        import s.implicits._
        val urls = SimWeb.seedUrls(FIX_DOCS, FIX_HOSTS, FIX_SEED).distinct
        val docs = urls.map(u => SimWeb.docFor(u, FIX_SEED, FIX_HOSTS))
        s.createDataset(docs).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
      }
      fixtureChecked = true
    }

  private def spansDf(s: SparkSession): DataFrame = {
    ensureSpansFixture(s)
    s.read.parquet(spansFixturePath)
  }

  private val duckSpans =
    s"spansrc AS (SELECT * FROM read_parquet('$spansFixturePath/*.parquet'))"

  /** S2/D2/X14 over the real span table: explode spans, extract URL
    * candidates from text spans, canonicalize against each page's own
    * origin (doc_id IS the page's canonical URL), keep http, distinct.
    * DuckDB side: unnest over the struct list.
    */
  private val q42 = Q("q42_s2_spans_extract",
    (s, dir) => {
      val cand = spansDf(s)
        .select(col("doc_id"), explode(col("spans")).as("span"))
        .filter(col("span.kind") === "text")
        .select(col("doc_id"),
          // native one-pass scan; the DuckDB side keeps regexp_extract_all,
          // so the oracle gate independently cross-checks the native scan
          explode(graft.plans.UrlExprs.extractUrls(col("span.text"))).as("url"))
        .withColumn("_base", graft.plans.UrlExprs.origin(col("doc_id")))
      Canon.canonicalizeCol(cand, "url", col("_base"))
        .filter(Canon.isHttp(col("canon_url")))
        .select("doc_id", "canon_url", "host")
        .distinct()
        .orderBy("doc_id", "canon_url")
    },
    Some(
      s"""WITH $duckSpans,
         |sp AS (SELECT doc_id, unnest(spans) AS span FROM spansrc),
         |cand AS (SELECT doc_id,
         |  unnest(regexp_extract_all(span.text, '${SimWeb.urlRegex}')) AS url
         |  FROM sp WHERE span.kind = 'text'),
         |based AS (SELECT doc_id, url,
         |  regexp_extract(doc_id, '^([a-z]+://[^/?#]*)', 1) AS _b FROM cand),
         |_c1 AS (SELECT *, CASE WHEN url LIKE '/%' THEN _b||url ELSE url END AS _abs FROM based),
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
         |  FROM _c4)
         |SELECT DISTINCT doc_id, canon_url, host FROM canoned
         |WHERE canon_url LIKE 'http%'
         |ORDER BY doc_id, canon_url""".stripMargin))

  /** S3/A5/X2 over the real span table: per-doc reassembly in offset order —
    * text content joined by ' ' exactly as the reference concatenates
    * review content rows (/root/reference/src/api/crawling_review
    * .py:408-417), media thumbnails rewritten (X2) and collected in offset
    * order, plus the span-order invariant columns (n_spans, max_offset).
    */
  private val q43 = Q("q43_s3_span_reassembly",
    (s, dir) => spansDf(s)
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(filter(collect_list(struct(col("span.offset"), col("span.text"))),
              x => x.getField("text") =!= "")),
            x => x.getField("text")),
          " ").as("content"),
        array_join(
          transform(
            array_sort(filter(
              collect_list(struct(col("span.offset"), col("span.media_ref"))),
              x => x.getField("media_ref") =!= "")),
            x => Canon.thumbnailRewrite(x.getField("media_ref"))),
          " ").as("media_canon"),
        count(lit(1)).as("n_spans"),
        max(col("span.offset")).as("max_offset"))
      .orderBy("doc_id"),
    Some(
      s"""WITH $duckSpans,
         |sp AS (SELECT doc_id, unnest(spans) AS span FROM spansrc),
         |f AS (SELECT doc_id, span.kind AS kind, span.text AS text,
         |  span.media_ref AS media_ref, span.offset AS off FROM sp)
         |SELECT doc_id,
         |  string_agg(text, ' ' ORDER BY off) FILTER (text != '') AS content,
         |  coalesce(string_agg(regexp_replace(media_ref, '/remote/[^/]+/image', '/remote/292x292ex/image'),
         |    ' ' ORDER BY off) FILTER (media_ref != ''), '') AS media_canon,
         |  count(*) AS n_spans, max(off) AS max_offset
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  val qs: Seq[Q] = Seq(q38, q39, q40, q41, q42, q43, q45)
}
