package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs batched inside mapPartitions (the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline: partition-local model init,
  * row batches in, feature rows out).
  *
  * The image path is REAL end-to-end: `parseImageHeader` reads width/height
  * out of actual JPEG (SOF frame header) and PNG (IHDR chunk) container
  * bytes with pure header arithmetic (the cheap metadata-only scan, oracle-
  * checked by q27), and `decodeImage` decodes the full pixel raster with the
  * JDK's own codecs (`javax.imageio`, headless — no external library) and
  * embeds it as an 8×8 box-averaged luma thumbnail: EMB_DIMS=64 floats,
  * deterministic in the pixel content, dimensioned to feed the ANN queries
  * (q28/q30 run over 64-dim vectors). Only NON-image media (audio
  * waveform / video frame decode — codecs the JDK does not ship) fall back
  * to `decodeStub`'s deterministic synthetic features; the stub is loudly
  * marked. Schema, batch shape, partition-local decoder lifecycle, and the
  * typed output contract are identical across both paths (MultimodalSpec).
  */
object Multimodal {

  /** Embedding width for every media kind: an 8×8 luma grid for decoded
    * images, and the stub's synthetic vector for non-image media — one
    * schema so downstream ANN joins never branch on kind.
    */
  val EMB_GRID = 8
  val EMB_DIMS: Int = EMB_GRID * EMB_GRID

  /** Pure-JVM image dimension parse: (format, width, height) from real
    * container headers, None when the payload is not a recognized image
    * (→ caller falls back to the stub's synthetic metadata).
    *
    * JPEG: walk the marker stream from SOI (FFD8); every frame header
    * SOFn (0xC0-0xCF minus DHT/JPG/DAC = C4/C8/CC) carries
    * [len:2][precision:1][height:2][width:2]; standalone markers
    * (TEM/RSTn/SOI/EOI) have no length field; scan stops at SOS (the
    * entropy-coded stream — dimensions always precede it).
    *
    * PNG: 8-byte signature then the IHDR chunk, whose width/height are
    * big-endian u32 at fixed offsets 16/20.
    */
  def parseImageHeader(payload: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)

    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (payload.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i))
        && new String(payload, 12, 4, "US-ASCII") == "IHDR") {
      Some(("png", u32(16).toInt, u32(20).toInt))
    } else if (payload.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < payload.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        val marker = u8(i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
          i += 2 // standalone: TEM, RSTn, SOI, EOI — no length field
        } else if (marker >= 0xc0 && marker <= 0xcf
            && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn: len, precision, height, width
          if (i + 8 >= payload.length) return None
          return Some(("jpeg", u16(i + 7), u16(i + 5)))
        } else if (marker == 0xda) {
          return None // SOS before any SOF: malformed
        } else {
          if (i + 3 >= payload.length) return None
          i += 2 + u16(i + 2) // length includes its own 2 bytes
        }
      }
      None
    } else None
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      embedding: Array[Float])

  /** REAL pixel decode + embedding for image payloads, no external
    * dependency: the JDK ships JPEG and PNG codecs (`javax.imageio`,
    * headless). Returns None when the bytes are not a decodable image
    * (→ caller falls back to the stub's synthetic features).
    *
    * The embedding is an 8×8 box-averaged luma thumbnail (Rec.601 luma,
    * normalized to [0,1], row-major EMB_DIMS floats) — a deterministic
    * stand-in for a learned encoder with the same Spark-side contract
    * (fixed-width Array[Float] per row, partition-local decoder reuse),
    * and the canonical perceptual-hash front half (aHash/pHash start from
    * exactly this grid). Swapping in a CNN changes only this function.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    // corrupt/truncated bytes surface as IIOException or, from some codec
    // internals, unchecked exceptions — every decode failure means the same
    // thing here: not a decodable image
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val emb = new Array[Float](EMB_DIMS)
      // proportional cells; a cell never starts past the raster
      // (gx*w/8 <= 7w/8 < w) and always covers >= 1 pixel row/col
      val x0s = new Array[Int](EMB_GRID)
      val x1s = new Array[Int](EMB_GRID)
      var g = 0
      while (g < EMB_GRID) {
        x0s(g) = g * w / EMB_GRID
        x1s(g) = math.min(w, math.max((g + 1) * w / EMB_GRID, x0s(g) + 1))
        g += 1
      }
      // one bulk getRGB per scanline: the per-pixel overload pays a bounds
      // check + ColorModel conversion PER CALL — an order of magnitude on
      // the per-document hot path. Rows are fetched per cell-row span (not
      // mapped 1:1 to grid rows) because cells can OVERLAP on sub-8px
      // rasters; per-cell accumulation order stays (y asc, x asc), so the
      // embedding is bit-identical to the per-pixel formulation
      // (MultimodalSpec pins it against an independent per-pixel twin)
      val rowBuf = new Array[Int](w)
      var gy = 0
      while (gy < EMB_GRID) {
        val y0 = gy * h / EMB_GRID
        val y1 = math.min(h, math.max((gy + 1) * h / EMB_GRID, y0 + 1))
        val sums = new Array[Double](EMB_GRID)
        var y = y0
        while (y < y1) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var gx = 0
          while (gx < EMB_GRID) {
            var s = sums(gx)
            var x = x0s(gx)
            val x1 = x1s(gx)
            while (x < x1) {
              val rgb = rowBuf(x)
              s += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            sums(gx) = s
            gx += 1
          }
          y += 1
        }
        var gx = 0
        while (gx < EMB_GRID) {
          emb(gy * EMB_GRID + gx) = (sums(gx) /
            ((x1s(gx) - x0s(gx)).toLong * (y1 - y0) * 255.0)).toFloat
          gx += 1
        }
        gy += 1
      }
      Some((w, h, emb))
    }
  }

  /** STUB for NON-image media (audio waveform / video frame decode — codecs
    * the JDK does not ship; image payloads take the REAL `decodeImage` path
    * above). Deterministic in the payload bytes; replace with a real codec
    * where the libraries exist. Marked intentionally — do not "fix".
    */
  def decodeStub(payload: Array[Byte], kind: String): (Int, Int, Int, Array[Float]) = {
    var h = 0xcafef00dL
    var i = 0
    while (i < payload.length) { h = graft.gen.SimWeb.splitmix(h ^ (payload(i) & 0xffL)); i += 1 }
    val w = 64 + ((h & Long.MaxValue) % 960).toInt
    val ht = 64 + ((graft.gen.SimWeb.splitmix(h) & Long.MaxValue) % 960).toInt
    val frames = if (kind == "video") 1 + ((h & Long.MaxValue) % 30).toInt else 1
    val emb = new Array[Float](EMB_DIMS)
    var j = 0
    var hh = h
    while (j < EMB_DIMS) {
      hh = graft.gen.SimWeb.splitmix(hh)
      emb(j) = ((hh & Long.MaxValue) % 2000 - 1000) / 1000.0f
      j += 1
    }
    (w, ht, frames, emb)
  }

  /** The distributed decode pipeline: partition-local init (the "model
    * load"), then per-row decode. Input partitioning is preserved — callers
    * repartition upstream if payload sizes are skewed.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // partition-local heavyweight init, amortized over the whole
      // partition like the reference's per-process browser (SURVEY R3):
      // pin ImageIO headless + cacheless ONCE per task, not per row (a
      // disk-backed stream cache would put a temp-file create/delete on
      // every decode)
      java.lang.System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        // real pixel decode for image rows (JDK codecs); audio/video — and
        // image rows whose bytes don't decode — fall back to the stub.
        // Kind gates the decode: an audio/video payload can legitimately
        // START with JPEG/PNG magic (embedded cover art), and decoding
        // that would silently assign the artwork's features to the track.
        val decoded = if (r.kind == "image") decodeImage(r.payload) else None
        val (w, h, f, emb) = decoded match {
          case Some((pw, ph, pemb)) => (pw, ph, 1, pemb)
          case None =>
            val (sw, sh, sf, semb) = decodeStub(r.payload, r.kind)
            // undecodable image bytes may still carry a parseable container
            // header (truncated file): metadata stays real where it can be
            val (hw, hh) = (if (r.kind == "image") parseImageHeader(r.payload)
              else None)
              .map { case (_, pw, ph) => (pw, ph) }
              .getOrElse((sw, sh))
            (hw, hh, sf, semb)
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, f, emb)
      }
    }
  }

  /** Build a media table from the documents testdata (text bytes standing in
    * for opaque payloads), exercising the binary-column schema path.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
