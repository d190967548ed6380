package graft.fetch

import graft.gen.SimWeb

/** The media half of the simulated web (BASELINE.json input_hint: the crawl
  * corpus is INTERLEAVED text + media spans): text spans feed extraction and
  * near-dup, and each media span's `media_ref` — a thumbnail-CDN URL with a
  * `/remote/WxH/` size segment, the same surface the X2 rewrite canonizes —
  * resolves HERE to deterministic real JPEG bytes, the way `FetchSim`
  * resolves a canon_url to deterministic spans (a real deployment GETs the
  * ref; the sim synthesizes the response).
  *
  * The served raster is REAL: an actual JPEG container the production
  * `Multimodal.decodeImage` path decodes with the JDK codec, carrying a
  * per-ref gray gradient so different refs embed differently. Served
  * dimensions derive from the ref's requested WxH but are folded into
  * [8, 48] px — a thumbnail server answering a bounded variant of the
  * request — so per-span synthesis cost is a fixture constant, not a knob
  * an adversarial ref controls (the requested size is data, and a crawl
  * must not let data size its own fixtures).
  */
object MediaFetchSim {

  private val sizeSeg = "/remote/(\\d{1,9})x(\\d{1,9})/".r.unanchored

  /** The WxH the ref requests, or a hash-derived fallback for refs without
    * a parseable size segment (the sim web always emits one; a real crawl
    * sees arbitrary URLs).
    */
  private[fetch] def requestedDims(ref: String, seed: Long): (Int, Int) =
    ref match {
      case sizeSeg(w, h) => (w.toInt, h.toInt)
      case _ =>
        val m = SimWeb.mix(seed, s"mediadims:$ref")
        (100 + ((m & Long.MaxValue) % 400).toInt,
          100 + ((SimWeb.splitmix(m) & Long.MaxValue) % 400).toInt)
    }

  /** Deterministic JPEG bytes for `ref` — the simulated GET response. */
  def fetchBytes(ref: String, seed: Long): Array[Byte] = {
    val (rw, rh) = requestedDims(ref, seed)
    val w = 8 + rw % 41 // served thumbnail: folded into [8, 48]
    val h = 8 + rh % 41
    val h0 = SimWeb.mix(seed, s"media:$ref")
    val base = (h0 & 0xffL).toInt
    val dx = 1 + ((h0 >>> 8) % 7L).toInt
    val dy = 1 + ((h0 >>> 16) % 7L).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (base + x * dx + y * dy) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}
