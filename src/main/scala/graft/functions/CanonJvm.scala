package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side twins of the Column functions in Canon, for code that runs
  * outside Catalyst (Bloom prefilter, fetch simulator, sequential oracle)
  * and for the native one-pass expressions in `graft.plans.UrlExprs`.
  * Kept bit-identical with the Column versions (same md5-prefix hash, same
  * regex language) — CanonSpec/ExtractSpec pin the equivalences with
  * property tests, and the DuckDB oracle (which keeps the regex-form SQL)
  * independently re-checks them on every Verify run.
  */
object CanonJvm {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** == Canon.md5Long: first 15 hex digits of md5 as a non-negative long. */
  def md5Long(s: String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes("UTF-8"))
    // first 15 hex chars = 7 full bytes + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  // ------------------------------------------------------------ canon (X14)

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  /** ASCII-only lowercase — the exact semantics of Canon.asciiLower's
    * `translate(c, 'A-Z', 'a-z')`: non-ASCII letters are left untouched
    * (deliberately NOT String.toLowerCase, which is Unicode-aware).
    */
  def asciiLower(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == n) return s
    val a = s.toCharArray
    while (i < n) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** Query parts ordered by code point — identical to Spark's
    * `array_sort` over UTF8String (unsigned UTF-8 byte order == code-point
    * order), which differs from Java String ordering only for surrogate
    * pairs; the comparator makes the twin exact rather than ASCII-only.
    */
  private val cpOrder = new java.util.Comparator[String] {
    override def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** split on '&' keeping ALL empty parts — `split(q, '&')` with Spark's
    * default limit -1 ("a&&b&" → ["a","","b",""]).
    */
  private def splitAmp(q: String): Array[String] = {
    var cnt = 1
    var i = 0
    while (i < q.length) { if (q.charAt(i) == '&') cnt += 1; i += 1 }
    val out = new Array[String](cnt)
    var s = 0
    var k = 0
    i = 0
    while (i < q.length) {
      if (q.charAt(i) == '&') { out(k) = q.substring(s, i); k += 1; s = i + 1 }
      i += 1
    }
    out(k) = q.substring(s)
    out
  }

  /** One-pass twin of the staged Column canonicalization
    * (Canon.canonicalizeCol / the 6-regex DuckDB oracle CTE chain):
    * resolve a root-relative url against `base`, strip from the first '#',
    * lowercase (ASCII) scheme and host:port, strip scheme-default ports,
    * normalize the empty path to "/", sort query params ('?' with an empty
    * query is dropped, exactly like the `when(q === '')` branch).
    * Degenerate inputs reproduce the regex pipeline's forms: no
    * `scheme://` match ⇒ scheme and host are '' (yielding ":///…"), a '?'
    * anywhere still contributes the query part.
    */
  @inline private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** Twin of Java `replaceAll("#.*$", "")`: a match is '#' plus the maximal
    * run of non-line-terminator chars, anchored at end-of-input or before
    * the FINAL line terminator (Java's `$`). For inputs without line
    * terminators this is simply "cut at the first '#'"; the exact form
    * keeps the twin byte-identical on arbitrary adversarial strings.
    */
  private def stripFragment(u: String): String = {
    val n = u.length
    var i = u.indexOf('#')
    while (i >= 0) {
      var j = i + 1
      while (j < n && !isLineTerm(u.charAt(j))) j += 1
      val ok = (j == n) ||
        (j == n - 1 && isLineTerm(u.charAt(j))) ||
        (j == n - 2 && u.charAt(j) == '\r' && u.charAt(n - 1) == '\n')
      if (ok) return u.substring(0, i) + u.substring(j)
      i = u.indexOf('#', i + 1)
    }
    u
  }

  /** Twin of Java `replaceAll(suffix + "$", "")` for a literal suffix:
    * removes `suffix` when it ends at end-of-input or just before the final
    * line terminator (leftmost match, like the regex).
    */
  private def stripSuffixDollar(s: String, suffix: String): String = {
    val n = s.length
    val m = suffix.length
    // candidate $ positions, leftmost-match first
    var e = -1
    val eBeforeCrLf = if (n >= 2 && s.charAt(n - 2) == '\r' && s.charAt(n - 1) == '\n') n - 2 else Int.MaxValue
    val eBeforeTerm = if (n >= 1 && isLineTerm(s.charAt(n - 1))) n - 1 else Int.MaxValue
    val cands = Array(math.min(eBeforeCrLf, eBeforeTerm), math.max(eBeforeCrLf, eBeforeTerm), n)
    var k = 0
    while (e < 0 && k < 3) {
      val c = cands(k)
      if (c != Int.MaxValue && c >= m && s.regionMatches(c - m, suffix, 0, m)) e = c
      k += 1
    }
    if (e < 0) s else s.substring(0, e - m) + s.substring(e)
  }

  def canonUrl(u0: String, base: String): String = {
    val u = if (u0.startsWith("/")) base + u0 else u0
    val nf = stripFragment(u)
    val n = nf.length
    // scheme: ^([a-zA-Z][a-zA-Z0-9+.-]*)://  (greedy class scan then "://";
    // the class excludes ':' so Java regex has no backtracking alternatives)
    var schemeEnd = -1
    if (n > 0 && isAlpha(nf.charAt(0))) {
      var i = 1
      while (i < n && isSchemeChar(nf.charAt(i))) i += 1
      if (i + 2 < n && nf.charAt(i) == ':' && nf.charAt(i + 1) == '/' &&
        nf.charAt(i + 2) == '/') schemeEnd = i
    }
    var scheme = ""
    var hp = ""
    var p0 = ""
    if (schemeEnd >= 0) {
      scheme = asciiLower(nf.substring(0, schemeEnd))
      // a '#' can survive stripFragment when its $ anchor fails (mid-string
      // line terminators) — the [^/?#] / [^?#] classes still stop at it
      val hs = schemeEnd + 3
      var he = hs
      while (he < n && { val c = nf.charAt(he); c != '/' && c != '?' && c != '#' }) he += 1
      hp = asciiLower(nf.substring(hs, he))
      var pe = he
      while (pe < n && { val c = nf.charAt(pe); c != '?' && c != '#' }) pe += 1
      p0 = nf.substring(he, pe)
    }
    // twin of regexp_extract(_nf, "\\?([^#]*)", 1): first '?', to '#' or end
    val qi = nf.indexOf('?')
    val q = if (qi < 0) ""
    else {
      val qh = nf.indexOf('#', qi + 1)
      if (qh < 0) nf.substring(qi + 1) else nf.substring(qi + 1, qh)
    }
    val host =
      if (scheme == "http") stripSuffixDollar(hp, ":80")
      else if (scheme == "https") stripSuffixDollar(hp, ":443")
      else hp
    val sb = new java.lang.StringBuilder(
      scheme.length + host.length + p0.length + q.length + 8)
    sb.append(scheme).append("://").append(host)
    if (p0.isEmpty) sb.append('/') else sb.append(p0)
    if (!q.isEmpty) {
      sb.append('?')
      if (q.indexOf('&') < 0) sb.append(q)
      else {
        val parts = splitAmp(q)
        java.util.Arrays.sort(parts, cpOrder)
        var i = 0
        while (i < parts.length) {
          if (i > 0) sb.append('&')
          sb.append(parts(i))
          i += 1
        }
      }
    }
    sb.toString
  }

  /** Host[:non-default-port] of a canonical URL — '' when the input has no
    * "://". On canonUrl output this recovers exactly the staged pipeline's
    * `host` column (the canonical path always begins with '/', and a
    * canonical host contains neither '/' nor '?').
    */
  def canonHost(canon: String): String = {
    val si = canon.indexOf("://")
    if (si < 0) return ""
    val hs = si + 3
    var he = hs
    val n = canon.length
    while (he < n && { val c = canon.charAt(he); c != '/' && c != '?' }) he += 1
    canon.substring(hs, he)
  }

  /** Twin of `regexp_extract(url, "^([a-z]+://[^/?#]*)", 1)` — the page
    * origin used as the base for resolving root-relative hrefs (X8).
    * Lowercase-only scheme by design: the input is an already-canonical
    * doc_id.
    */
  def origin(u: String): String = {
    val n = u.length
    var i = 0
    while (i < n && u.charAt(i) >= 'a' && u.charAt(i) <= 'z') i += 1
    if (i == 0 || i + 2 >= n) return ""
    if (!(u.charAt(i) == ':' && u.charAt(i + 1) == '/' && u.charAt(i + 2) == '/'))
      return ""
    var j = i + 3
    while (j < n && { val c = u.charAt(j); c != '/' && c != '?' && c != '#' }) j += 1
    u.substring(0, j)
  }

  // -------------------------------------------------------- extraction (D2)

  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  // SimWeb.urlRegex alternation "(https?|HTTPS|HTTP)" in Java-regex
  // backtracking order: each prefix is tried with its own "://" + body check.
  private val SCHEMES = Array("https", "http", "HTTPS", "HTTP")

  /** One-pass twin of
    * `SimWeb.urlRegex.r.findAllIn(text)` (== regexp_extract_all with the
    * same pattern): leftmost, non-overlapping matches of
    * `(https?|HTTPS|HTTP)://[^\s]+|/vp/products/[0-9]+`, in order.
    * `\s` is Java's default (non-Unicode) class: space \t \n \x0B \f \r.
    */
  def extractUrls(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String](4)
    val n = s.length
    var i = 0
    while (i < n) {
      var end = -1
      // alternative 1, in alternation order with backtracking over prefixes
      var a = 0
      while (end < 0 && a < SCHEMES.length) {
        val sch = SCHEMES(a)
        val p = i + sch.length
        if (p + 3 <= n && s.regionMatches(i, sch, 0, sch.length) &&
          s.charAt(p) == ':' && s.charAt(p + 1) == '/' && s.charAt(p + 2) == '/') {
          var j = p + 3
          while (j < n && !isJavaWs(s.charAt(j))) j += 1
          if (j > p + 3) end = j // [^\s]+ needs at least one char
        }
        a += 1
      }
      // alternative 2: /vp/products/[0-9]+
      if (end < 0 && s.regionMatches(i, "/vp/products/", 0, 13)) {
        var j = i + 13
        while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        if (j > i + 13) end = j
      }
      if (end >= 0) { out.add(s.substring(i, end)); i = end }
      else i += 1
    }
    out
  }

  // --------------------------------------- UTF8String entry points (codegen)

  def startsWithSlash(u: UTF8String): Boolean =
    u.numBytes() > 0 && u.getByte(0) == '/'.toByte

  def canonUrlU(u: UTF8String, base: UTF8String): UTF8String =
    UTF8String.fromString(canonUrl(u.toString, base.toString))

  def canonHostU(c: UTF8String): UTF8String =
    UTF8String.fromString(canonHost(c.toString))

  def originU(u: UTF8String): UTF8String =
    UTF8String.fromString(origin(u.toString))

  def extractUrlsData(t: UTF8String): ArrayData = {
    val found = extractUrls(t.toString)
    val n = found.size()
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) { arr(i) = UTF8String.fromString(found.get(i)); i += 1 }
    new GenericArrayData(arr)
  }
}
