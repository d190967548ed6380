package graft.model

/** Core row types for the crawl engine (SURVEY.md §1.3).
  *
  * `Span` / `Doc` mirror the interleaved text+media document shape scanned by
  * the reference crawler (reference: src/api/crawling_review.py:397-417,
  * src/api/crawling_info_list.py:12-24,139-168 — anchors, imgs, text blocks
  * iterated in DOM order). `offset` defines the span order invariant
  * (kind, text, media_ref, order).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** One unit of scheduled fetch work — the typed epoch output demanded by the
  * north rule. Analog of the reference's per-worker (url, job_id) tuples
  * (reference: src/api/crawling_multi.py:75-76).
  */
final case class FetchTask(
    epoch: Long,
    host: String,
    canon_url: String,
    depth: Int,
    score: Double,
    rank: Int)

/** Frontier state row. Analog of the reference's seed list + page cursors +
  * retry loops (reference: src/model/crawling_model.py:3-5,
  * src/api/crawling_info_list.py:101-131).
  * state ∈ {pending, fetched, failed, exhausted}.
  */
final case class FrontierEntry(
    url: String,
    canon_url: String,
    host: String,
    depth: Int,
    score: Double,
    state: String,
    retry_count: Int,
    discovered_epoch: Long)

/** Per-host politeness budget (north-rule surface; the reference hard-codes
  * dwell constants instead — reference: src/api/crawling_review.py:517,
  * src/api/crawling_info_list.py:90).
  */
final case class RobotsRule(host: String, crawl_delay_ms: Long, disallow: Seq[String])

/** Per-fetch lineage row (reference analog: per-worker counts,
  * src/api/crawling_multi.py:61-66).
  */
final case class FetchLog(
    epoch: Long,
    partition_id: Int,
    canon_url: String,
    status: String,
    n_spans: Int,
    n_urls_out: Int)

/** Per-epoch counters (reference analog: expected_count / success / failed
  * shared counters, src/main.py:28-31, src/api/crawling_info_list.py:135-137).
  */
final case class EpochMetrics(
    epoch: Long,
    fetched: Long,
    discovered: Long,
    deduped: Long,
    emitted: Long,
    errors: Long)
