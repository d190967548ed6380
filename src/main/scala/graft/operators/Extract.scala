package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Canon
import graft.gen.SimWeb

/** S2/S3/D2 — span scan + URL-candidate extraction (reference: per-item
  * anchor iteration src/api/crawling_info_list.py:12-24,139; span order =
  * DOM order via `offset`). Input: docs with (doc_id, spans); output: one
  * row per distinct canonical outbound URL with its source doc.
  */
object Extract {

  /** Explode spans in offset order and pull raw URL candidates from text
    * spans with the simulated-web grammar. Media spans carry refs but are
    * not enqueued (the reference rewrites thumbnails, X2, but never crawls
    * them).
    */
  def candidates(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .filter(col("span.kind") === "text")
      .select(col("doc_id"),
        // native one-pass scan == regexp_extract_all(text, SimWeb.urlRegex)
        // (ExtractSpec pins the equivalence; SeqOracle keeps the regex form)
        explode(graft.plans.UrlExprs.extractUrls(col("span.text"))).as("url"))

  /** Canonicalize candidates against each page's own origin (X14 + X8 with
    * per-row base), drop non-http (F3), dedup per epoch (D1).
    */
  def canonCandidates(docs: DataFrame): DataFrame = {
    val cand = candidates(docs)
      // the page's own origin (scheme INCLUDED — an http page must resolve
      // relative links to http, X8), doc_id being the page's canon_url
      .withColumn("_base", graft.plans.UrlExprs.origin(col("doc_id")))
    Canon.canonicalizeCol(cand, "url", col("_base"))
      .filter(Canon.isHttp(col("canon_url")))
      .select(col("canon_url"), col("host"), col("doc_id").as("src_doc"))
      .distinct()
  }

  /** The distinct canonical-URL SET of a corpus — for consumers that need
    * no per-source attribution (seen-set building, the bench's dedup
    * stage). One shuffle on canon_url alone; going through canonCandidates
    * + a second distinct would shuffle the full (canon_url, host, src_doc)
    * stream twice for the same result.
    */
  def canonUrlSet(docs: DataFrame): DataFrame = {
    val cand = candidates(docs)
      .withColumn("_base", graft.plans.UrlExprs.origin(col("doc_id")))
    Canon.canonicalizeCol(cand, "url", col("_base"))
      .filter(Canon.isHttp(col("canon_url")))
      .select("canon_url")
      .distinct()
  }
}
