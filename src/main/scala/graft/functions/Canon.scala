package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + scalar extraction functions (SURVEY.md §2.7).
  *
  * All functions are pure `Column` compositions of built-in (codegen'd)
  * expressions — no UDFs — so every one of them stays inside whole-stage
  * codegen AND has an exact ANSI-SQL equivalent runnable by the DuckDB
  * oracle harness. Regex patterns deliberately avoid constructs whose
  * semantics differ between Java regex (Spark) and RE2 (DuckDB):
  * no lookahead/lookbehind, no backreferences.
  *
  * Reference semantics being reproduced (path:line under /root/reference):
  *  - X1 product-code: url.split("products/")[-1].split("?")[0]
  *    (src/api/crawling_info_list.py:57-59, src/api/crawling_review.py:49-51)
  *  - X2 thumbnail-size rewrite /remote/<size>/image → /remote/292x292ex/image
  *    (src/api/crawling_info_list.py:62-63)
  *  - X3 lenient digit-strip-to-int, 0 on empty (src/api/crawling_info_list.py:66-81)
  *  - X4 strict digit-strip-to-int, null on empty (src/api/crawling_review.py:60-62)
  *  - X5 star rating = round(pct/20, 2) (src/api/crawling_review.py:54-57)
  *  - X6 Korean price-line extraction (src/api/crawling_info_list.py:44-54)
  *  - X8 relative→absolute URL (src/api/crawling_info_list.py:33-34)
  *  - X9 category breadcrumb join, skipping the root element
  *    (src/api/crawling_review.py:270-282)
  *  - X14 full canonicalization is north-rule-mandated (BASELINE.json): the
  *    reference only does the partial X1/X8 forms.
  */
object Canon {

  /** Hosts for which :80 / :443 are default ports, stripped during canon. */
  private val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  /** ASCII-only lowercase via `translate` — deliberately NOT `lower()`:
    * Spark 4's collation-aware lower routes through ICU
    * (CollationSupport.Lower.execBinaryICU), whose first use pays a ~10 s
    * blocking class-init per JVM and a per-row ICU call forever after.
    * URL schemes and hosts are case-insensitive *ASCII* by RFC 3986 (IDNs
    * are punycoded before they reach a frontier), so the ASCII map is the
    * semantically correct — and codegen-cheap — canonicalization.
    */
  private val UC = ('A' to 'Z').mkString
  private val LC = ('a' to 'z').mkString
  def asciiLower(c: Column): Column = translate(c, UC, LC)

  /** X8 — resolve a root-relative href against a base origin.
    * Reference: src/api/crawling_info_list.py:33-34.
    */
  def absUrl(u: Column, base: String): Column =
    when(u.startsWith("/"), concat(lit(base), u)).otherwise(u)

  /** Scheme of an absolute URL, lowercased ('' if none). */
  def urlScheme(u: Column): Column = asciiLower(regexp_extract(u, schemeRe, 1))

  /** host[:port] part, lowercased ('' if not an absolute URL). */
  def urlHostPort(u: Column): Column =
    asciiLower(regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))

  /** Host with scheme-default port stripped (X14 component). */
  def urlHost(u: Column): Column = {
    val s = urlScheme(u)
    val hp = urlHostPort(u)
    when(s === "http", regexp_replace(hp, ":80$", ""))
      .when(s === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Path component; empty path normalizes to "/" (X14 component). */
  def urlPath(u: Column): Column = {
    val p = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Query string without the leading '?' ('' if none). */
  def urlQuery(u: Column): Column = regexp_extract(u, "\\?([^#]*)", 1)

  /** X14 — full canonical URL (north rule): resolve relative against `base`,
    * strip fragment, lowercase scheme+host, drop default ports, normalize
    * empty path to "/", sort query parameters.
    */
  def canonUrl(u: Column, base: String): Column = canonUrlCol(u, lit(base))

  /** canonUrl with a per-row base (SQL-function form) — the native one-pass
    * expression (graft.plans.UrlExprs.CanonUrlNative); semantics identical
    * to `canonUrlColRegex` below (CanonSpec pins the equivalence).
    */
  def canonUrlCol(u: Column, base: Column): Column =
    graft.plans.UrlExprs.canonUrl(u, base)

  /** The original regex formulation of canonUrlCol, kept as the in-repo
    * semantic twin the native expression is property-tested against (the
    * DuckDB oracle mirrors THIS form). Fused macro — see canonicalizeColRegex
    * for the staged variant used in pipelines before round 3.
    */
  def canonUrlColRegex(u: Column, base: Column): Column = {
    val abs = when(u.startsWith("/"), concat(base, u)).otherwise(u)
    val nofrag = regexp_replace(abs, "#.*$", "")
    val q = urlQuery(nofrag)
    val sortedQ = array_join(array_sort(split(q, "&")), "&")
    concat(
      urlScheme(nofrag), lit("://"), urlHost(nofrag), urlPath(nofrag),
      when(q === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Staged canonicalization: adds `canon_url` + `host` to `df`, computing
    * each sub-step (absolute form, fragment strip, scheme, host:port, path,
    * query) as its own projected column. A single fused `canonUrl` Column
    * macro-expands every sub-step into each consumer — the expression tree
    * grows ~30× and falls out of whole-stage codegen; staging keeps each
    * regexp evaluated once per row (CollapseProject does not re-inline
    * non-cheap expressions that are referenced more than once).
    */
  def canonicalize(df: org.apache.spark.sql.DataFrame, urlCol: String,
      base: String): org.apache.spark.sql.DataFrame =
    canonicalizeCol(df, urlCol, lit(base))

  /** canonicalize with a per-row base origin (e.g. the fetched page's own
    * origin, for resolving root-relative hrefs — X8 against dynamic base).
    * Round 3: native one-pass expressions (graft.plans.UrlExprs) replace
    * the 6-regex staged pipeline in the hot path — the local[32] profile
    * put the staged form's regex evaluations at the center of the crawl
    * pipeline's dominant stage. `canonicalizeColRegex` keeps the regex
    * formulation as the semantic twin (CanonSpec property-tests the two
    * against each other and against the plain-Scala oracle; the DuckDB
    * oracle SQL still mirrors the regex form, so every Verify run
    * independently cross-checks the native scan).
    */
  def canonicalizeCol(df: org.apache.spark.sql.DataFrame, urlCol: String,
      base: Column): org.apache.spark.sql.DataFrame = {
    import graft.plans.UrlExprs
    df.withColumn("canon_url", UrlExprs.canonUrl(col(urlCol), base))
      .withColumn("host", UrlExprs.canonHost(col("canon_url")))
  }

  /** The staged regex formulation of canonicalizeCol (pre-round-3 hot
    * path), kept as the property-test twin of the native expressions.
    */
  def canonicalizeColRegex(df: org.apache.spark.sql.DataFrame, urlCol: String,
      base: Column): org.apache.spark.sql.DataFrame = {
    val u = col(urlCol)
    df.withColumn("_abs", when(u.startsWith("/"), concat(base, u)).otherwise(u))
      .withColumn("_nf", regexp_replace(col("_abs"), "#.*$", ""))
      .withColumn("_scheme", asciiLower(regexp_extract(col("_nf"), schemeRe, 1)))
      .withColumn("_hp",
        asciiLower(regexp_extract(col("_nf"), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)))
      .withColumn("_p0",
        regexp_extract(col("_nf"), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1))
      .withColumn("_q", regexp_extract(col("_nf"), "\\?([^#]*)", 1))
      .withColumn("host",
        when(col("_scheme") === "http", regexp_replace(col("_hp"), ":80$", ""))
          .when(col("_scheme") === "https", regexp_replace(col("_hp"), ":443$", ""))
          .otherwise(col("_hp")))
      .withColumn("canon_url", concat(
        col("_scheme"), lit("://"), col("host"),
        when(col("_p0") === "", lit("/")).otherwise(col("_p0")),
        when(col("_q") === "", lit(""))
          .otherwise(concat(lit("?"),
            array_join(array_sort(split(col("_q"), "&")), "&")))))
      .drop("_abs", "_nf", "_scheme", "_hp", "_p0", "_q")
  }

  /** X1 — product code from a product URL (string form; listing path keeps
    * it as string, review path casts to long — SURVEY note N3).
    * Semantics note: the reference computes
    * url.split("products/")[-1].split("?")[0] — on a URL with NO
    * "products/" segment that returns the whole URL, and with multiple
    * segments it keys off the LAST one. This regexp form returns '' /
    * first-occurrence instead; both call sites in the reference are guarded
    * so only single-occurrence product URLs reach it
    * (crawling_info_list.py:30-31 preference + 144-152 presence check),
    * where the two definitions coincide.
    */
  def productCode(u: Column): Column =
    regexp_extract(u, "products/([^?#/]+)", 1)

  /** X2 — rewrite thumbnail size segment to the canonical 292x292ex form. */
  def thumbnailRewrite(u: Column): Column =
    regexp_replace(u, "/remote/[^/]+/image", "/remote/292x292ex/image")

  /** X3 — lenient digit extraction: strip non-digits, 0 when none remain. */
  def numInStrLenient(c: Column): Column =
    coalesce(regexp_replace(c, "[^0-9]", "").cast("long"), lit(0L))

  /** X4 — strict digit extraction: null when no digits (callers coalesce
    * per-site defaults, mirroring the reference's try/except field defaults).
    */
  def numInStrStrict(c: Column): Column =
    regexp_replace(c, "[^0-9]", "").cast("long")

  /** X5 — star rating from a CSS width style ("width: 83%" → 4.15). */
  def starRating(style: Column): Column =
    round(numInStrStrict(style).cast("double") / 20.0, 2)

  /** X6 — extract Korean price literals ("12,900원") from a multi-line text,
    * in line order, as longs. Reference regex `^(?=\d)[\d,]+원$` rewritten
    * lookahead-free as `^[0-9][0-9,]*원$` (identical language).
    */
  def pricesKr(text: Column): Column =
    transform(
      filter(split(text, "\n"), x => x.rlike("^[0-9][0-9,]*원$")),
      x => regexp_replace(x, "[^0-9]", "").cast("long"))

  /** X7 — price fallback chain over an extracted price array:
    * first match = origin price, last = final price; single match ⇒ final
    * only (SURVEY note N1). Returns struct(origin_price, final_price).
    */
  def priceFallback(prices: Column): Column = {
    val n = size(prices)
    struct(
      when(n >= 2, element_at(prices, 1)).otherwise(lit(null).cast("long"))
        .as("origin_price"),
      when(n >= 1, element_at(prices, -1)).otherwise(lit(0L))
        .as("final_price"))
  }

  /** X9 — breadcrumb join: skip the root category, join the rest with ','. */
  def categoryConcat(crumbs: Column): Column =
    array_join(slice(crumbs, lit(2), greatest(size(crumbs) - 1, lit(0))), ",")

  /** F3 — scheme filter: keep only http(s) candidates. */
  def isHttp(u: Column): Column = u.startsWith("http")

  /** Product-URL preference predicate (W1): the reference prefers
    * /vp/products/ hrefs over any other candidate
    * (src/api/crawling_info_list.py:30-31).
    */
  def isProductUrl(u: Column): Column = u.contains("/vp/products/")

  /** Portable 60-bit hash: first 15 hex digits of md5, as a non-negative
    * long. Chosen over Spark's murmur3 `hash()` because the DuckDB oracle
    * can compute the identical value (`('0x'||substr(md5(x),1,15))::BIGINT`),
    * keeping every hash-derived operator (MinHash, SimHash, salting,
    * fingerprints) bit-for-bit verifiable. Still uniform enough for
    * partitioning/salting use.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** W5 — salted partition key for hot-host skew: hash(host) + salt derived
    * from the URL, so one hot domain spreads over `saltBuckets` partitions.
    * Politeness re-groups on bare `host` afterwards (SURVEY §4.2).
    */
  def saltedKey(host: Column, url: Column, saltBuckets: Int): Column =
    concat(host, lit("#"), pmod(md5Long(url), lit(saltBuckets)))
}
