package graft.functions

/** JVM-side twins of the Column functions in Canon, for code that runs
  * outside Catalyst (Bloom prefilter, fetch simulator, sequential oracle).
  * Kept bit-identical with the Column versions (same md5-prefix hash).
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
}
