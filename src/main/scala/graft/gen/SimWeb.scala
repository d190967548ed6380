package graft.gen

import graft.model.{Doc, Span}

/** Deterministic simulated web: the single source of truth for what any URL's
  * page contains, shared by the distributed fetch simulator
  * (graft.fetch.FetchSim, running inside mapPartitions) and the sequential
  * reference-semantics oracle (graft.oracle.SeqOracle). Everything is a pure
  * function of (seed, canon_url) — no network, no wall clock (sandbox
  * constraint C2 in SURVEY.md §7.2; the reference's Selenium fetch at
  * src/api/crawling_review.py:516-517 is replaced by this simulator, R4 note).
  *
  * Host popularity is Zipf(s≈1.2)-skewed so one hot host dominates — the
  * same single-hot-host pathology as the reference's page-range fan-out
  * (src/api/crawling_multi.py:48-61) — to exercise salted repartitioning.
  */
object SimWeb {

  /** splitmix64 — stable, fast, good avalanche; seeds all per-URL decisions. */
  def splitmix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def mix(seed: Long, s: String): Long = {
    var h = splitmix(seed)
    var i = 0
    while (i < s.length) { h = splitmix(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  private def pos(h: Long): Long = h & Long.MaxValue

  /** Zipf(s) host pick over `nHosts` ranks from a hash value. */
  def zipfHost(h: Long, nHosts: Int, s: Double = 1.2): Int = {
    // inverse-CDF over precomputed weights (nHosts is small)
    val w = zipfCdf(nHosts, s)
    val u = (pos(h) % 1000000L) / 1000000.0
    var i = 0
    while (i < nHosts - 1 && u > w(i)) i += 1
    i
  }

  private val cdfCache = scala.collection.concurrent.TrieMap.empty[(Int, Double), Array[Double]]
  private def zipfCdf(n: Int, s: Double): Array[Double] =
    cdfCache.getOrElseUpdate((n, s), {
      val w = (1 to n).map(r => 1.0 / math.pow(r, s)).toArray
      val tot = w.sum
      val cdf = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += w(i) / tot; cdf(i) = acc; i += 1 }
      cdf
    })

  def hostName(i: Int): String = s"shop$i.example.com"

  /** Ordered seed URLs (the analog of CrawlRequest.url_list,
    * reference src/model/crawling_model.py:3-5), Zipf-skewed over hosts.
    */
  def seedUrls(n: Int, nHosts: Int, seed: Long): Seq[String] =
    (0 until n).map { i =>
      val h = mix(seed, s"seed:$i")
      val host = hostName(zipfHost(h, nHosts))
      s"https://$host/vp/products/${pos(h) % 100000}"
    }

  private val filler = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  /** Outbound link targets of a page, pre-canonicalization, in page order.
    * Deliberately messy: uppercase hosts, default ports, fragments,
    * unsorted query params, root-relative forms, and one non-http link —
    * the canonicalizer's job (X14/X8/F3). Every variant's *canonical* form
    * is what the crawl frontier must see.
    */
  def rawLinks(canonUrl: String, seed: Long, nHosts: Int): Seq[String] = {
    val h0 = mix(seed, s"links:$canonUrl")
    val n = 2 + (pos(h0) % 4).toInt // 2..5 links
    (0 until n).map { j =>
      val hj = splitmix(h0 + j)
      val tgtHost = hostName(zipfHost(hj, nHosts))
      val code = pos(splitmix(hj)) % 100000
      (pos(hj) % 6).toInt match {
        case 0 => s"https://$tgtHost/vp/products/$code"
        case 1 => s"HTTPS://${tgtHost.toUpperCase}:443/vp/products/$code#reviews"
        case 2 => s"https://$tgtHost/vp/products/$code?b=2&a=1"
        case 3 => s"/vp/products/$code" // relative: resolves against page host
        case 4 => s"https://$tgtHost/search?q=w${pos(hj) % 50}&page=${1 + pos(hj) % 9}"
        case _ => s"javascript:void($code)" // dropped by scheme filter F3
      }
    }
  }

  /** The page a fetch of `canonUrl` observes: interleaved text+media spans
    * (BASELINE.json input_hint shape). Text spans embed the raw link forms;
    * media spans carry thumbnail refs with a size segment (X2 surface).
    * Offsets are strictly increasing — they define the span order invariant.
    */
  def docFor(canonUrl: String, seed: Long, nHosts: Int): Doc = {
    val links = rawLinks(canonUrl, seed, nHosts)
    val h0 = mix(seed, s"doc:$canonUrl")
    val spans = scala.collection.mutable.ArrayBuffer.empty[Span]
    var off = 0
    links.zipWithIndex.foreach { case (l, i) =>
      val w1 = filler((pos(splitmix(h0 + 2 * i)) % filler.length).toInt)
      val w2 = filler((pos(splitmix(h0 + 2 * i + 1)) % filler.length).toInt)
      spans += Span("text", s"$w1 see $l $w2", "", off)
      off += 1
      if (pos(splitmix(h0 + 7 * i)) % 3 == 0) {
        val sz = 100 + (pos(splitmix(h0 + 11 * i)) % 400)
        spans += Span("media", "",
          s"https://img.cdn.example.com/remote/${sz}x$sz/image/i${pos(splitmix(h0 + 13 * i)) % 100000}.jpg",
          off)
        off += 1
      }
    }
    spans += Span("text", s"tail ${filler((pos(h0) % filler.length).toInt)}", "", off)
    Doc(canonUrl, spans.toSeq)
  }

  // ------------------------------------------------------- plain-Scala canon
  // Independent reimplementation of the canonicalization semantics for the
  // sequential oracle (graft.oracle.SeqOracle) — deliberately NOT the Spark
  // Column code, so the two can check each other (SURVEY §5.2-3).

  def canonScala(url0: String, pageBase: String): String = {
    val url = if (url0.startsWith("/")) pageBase + url0 else url0
    val noFrag = { val i = url.indexOf('#'); if (i >= 0) url.substring(0, i) else url }
    val si = noFrag.indexOf("://")
    if (si < 0) return "://" + "/" // mirrors the Column pipeline's degenerate form
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    val pathStart = rest.indexWhere(c => c == '/' || c == '?')
    val (hp, tail) =
      if (pathStart < 0) (rest, "") else (rest.substring(0, pathStart), rest.substring(pathStart))
    val host0 = hp.toLowerCase
    val host =
      if (scheme == "http" && host0.endsWith(":80")) host0.dropRight(3)
      else if (scheme == "https" && host0.endsWith(":443")) host0.dropRight(4)
      else host0
    val qi = tail.indexOf('?')
    val (path0, query) = if (qi >= 0) (tail.substring(0, qi), tail.substring(qi + 1)) else (tail, "")
    val path = if (path0.isEmpty) "/" else path0
    val q = if (query.isEmpty) "" else "?" + query.split("&", -1).sorted.mkString("&")
    s"$scheme://$host$path$q"
  }

  /** scheme://host[:port] origin of a canonical URL ('' if malformed). */
  def originOfCanon(canon: String): String = {
    val si = canon.indexOf("://")
    if (si < 0) return ""
    val rest = canon.substring(si + 3)
    val e = rest.indexWhere(c => c == '/' || c == '?')
    canon.substring(0, si + 3) + (if (e < 0) rest else rest.substring(0, e))
  }

  def hostOfCanon(canon: String): String = {
    val si = canon.indexOf("://")
    if (si < 0) return ""
    val rest = canon.substring(si + 3)
    val e = rest.indexWhere(c => c == '/' || c == '?')
    if (e < 0) rest else rest.substring(0, e)
  }

  /** URL grammar of the simulated web, for extraction (same regex the Spark
    * extractor uses — SimWeb emits only URLs matching this grammar).
    */
  val urlRegex = "(https?|HTTPS|HTTP)://[^\\s]+|/vp/products/[0-9]+"

  def extractRawScala(text: String): Seq[String] =
    urlRegex.r.findAllIn(text).toSeq
}
