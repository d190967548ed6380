package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs batched inside mapPartitions (the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline: partition-local model init,
  * row batches in, feature rows out).
  *
  * All three media kinds decode REAL bytes with zero external dependencies:
  *
  *  - images: `parseImageHeader` reads width/height out of actual JPEG (SOF
  *    frame header) and PNG (IHDR chunk) container bytes with pure header
  *    arithmetic (the cheap metadata-only scan, oracle-checked by q27), and
  *    `decodeImage` decodes the full pixel raster with the JDK's own codecs
  *    (`javax.imageio`, headless) and embeds it as an 8×8 box-averaged luma
  *    thumbnail: EMB_DIMS=64 floats, deterministic in the pixel content,
  *    dimensioned to feed the ANN queries (q28/q30 run over 64-dim vectors);
  *  - audio: `decodeAudio` decodes WAV / AIFF / AU PCM with the JDK's own
  *    `javax.sound.sampled` container readers plus a manual PCM frame parse
  *    (8/16/24/32-bit, signed/unsigned, both endiannesses — so the embedding
  *    is bit-identical across containers of the same samples) and embeds the
  *    mono-mixed waveform as an EMB_DIMS-bin RMS loudness envelope;
  *  - video: `decodeVideo` walks an AVI RIFF container (pure chunk
  *    arithmetic, same style as the image header parse) and decodes
  *    MJPEG frames with the image codec, deterministically sampling at most
  *    VID_SAMPLE frames and averaging their luma-grid embeddings — the
  *    frame-sample operation of the multimodal brief.
  *
  * Only payloads in codecs the JDK genuinely does not ship (MP3/AAC audio,
  * H.264/VP9 video, …) — or bytes that fail to decode — fall back to
  * `decodeStub`'s deterministic synthetic features; the stub is loudly
  * marked. Schema, batch shape, partition-local decoder lifecycle, and the
  * typed output contract are identical across all paths (MultimodalSpec).
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

  /** How many frames `decodeVideo` actually decodes: evenly-spaced sample
    * indices over the chunk list, so per-row cost is bounded by the raster
    * size regardless of clip length (n_frames still reports the true count).
    */
  val VID_SAMPLE = 8

  /** Proportional cell `[lo, hi)` — THE grid rule, shared by the image luma
    * cells, the resize cells, and the audio RMS bins: a cell never starts
    * past the input (`i*n/out <= (out-1)*n/out < n`) and always covers at
    * least one unit. Long arithmetic inside: `i*n` overflows Int once
    * `out*n` passes 2^31 — a hostile ~400M-px image dimension decodes on a
    * large heap, and a 50k-wide pano resized to 50k is past it too. One
    * implementation so the overflow fix and the invariant live in exactly
    * one place (three hand-inlined copies of this rule once diverged on
    * exactly the Int/Long point).
    */
  @inline private[graft] def cellBounds(i: Int, n: Int, out: Int): (Int, Int) = {
    val lo = (i.toLong * n / out).toInt
    val hi = math.min(n.toLong, math.max((i + 1).toLong * n / out, lo + 1L)).toInt
    (lo, hi)
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** One schema for every media kind. `width`/`height` carry the kind's
    * primary dimensions: pixels for image/video, (sample_rate Hz, channels)
    * for audio; `n_frames` is 1 for images, the PCM frame count for audio,
    * and the container frame count for video.
    */
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
      val x0s = new Array[Int](EMB_GRID)
      val x1s = new Array[Int](EMB_GRID)
      var g = 0
      while (g < EMB_GRID) {
        val (lo, hi) = cellBounds(g, w, EMB_GRID)
        x0s(g) = lo
        x1s(g) = hi
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
        val (y0, y1) = cellBounds(gy, h, EMB_GRID)
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

  /** REAL audio decode + embedding, no external dependency: the JDK ships
    * WAV / AIFF / AU container readers (`javax.sound.sampled`). Returns
    * (sample_rate, channels, n_frames, embedding), or None when the bytes
    * are not a decodable audio file (→ caller falls back to the stub).
    *
    * PCM frames are parsed manually (8/16/24/32-bit, signed or unsigned,
    * either endianness) rather than routed through the JDK's format
    * converter, so the same samples yield a BIT-IDENTICAL embedding no
    * matter which container carried them (WAV is little-endian, AIFF/AU
    * big-endian — MultimodalSpec pins the equality). Non-PCM encodings the
    * JDK can convert (µ-law/a-law) are first widened to 16-bit signed PCM.
    *
    * The embedding is an EMB_DIMS-bin RMS loudness envelope of the
    * mono-mixed waveform (each bin the root-mean-square of its time slice,
    * full-scale normalized to [0,1], same proportional-cell rule as the
    * image grid) — the deterministic stand-in for a learned audio encoder,
    * with the identical Spark-side contract.
    */
  /** Upper bound on audio payloads the decoder will materialize: the PCM
    * read below holds the whole (possibly 2×-widened by the µ-law/a-law
    * conversion) sample stream in memory, and crawled bytes are untrusted —
    * a multi-GB payload's OutOfMemoryError is an Error that passes straight
    * through the NonFatal catches and kills the task (possibly the JVM)
    * instead of stub-falling-back. Beyond the cap the row routes to the
    * stub — the same bounded-per-row-cost posture as VID_SAMPLE; a real
    * pipeline ingests long-form audio through a chunking stage, not a
    * per-row decode. Sized so the worst-case transient (µ-law widened 2×
    * by the converter, then readAllBytes' accumulate-then-copy doubling
    * that again ≈ 4× the payload) stays a modest fraction of a typical
    * per-task heap share — 64 MB already covers ~35 minutes of 16 kHz
    * mono PCM, far past any crawled page asset.
    */
  val MaxAudioBytes: Int = 64 << 20

  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (payload.length > MaxAudioBytes) return None
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (in == null) return None
    val enc = in.getFormat.getEncoding
    val pcm =
      if (enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED) in
      else {
        // µ-law/a-law: let the JDK widen to PCM; anything it can't convert
        // (or a genuinely unsupported codec) is a stub fallback, not an error
        val f = in.getFormat
        try AudioSystem.getAudioInputStream(
          new AudioFormat(f.getSampleRate, 16, f.getChannels, true, false), in)
        catch { case scala.util.control.NonFatal(_) => return None }
      }
    val fmt = pcm.getFormat
    val bits = fmt.getSampleSizeInBits
    val ch = fmt.getChannels
    if (bits % 8 != 0 || bits < 8 || bits > 32 || ch < 1) return None
    val bps = bits / 8
    val frameSize = bps * ch
    val raw =
      try pcm.readAllBytes()
      catch { case scala.util.control.NonFatal(_) => return None }
    val n = raw.length / frameSize
    if (n == 0) return None
    val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
    val big = fmt.isBigEndian
    val fullScale = (1L << (bits - 1)).toDouble
    val bias = if (signed) 0L else 1L << (bits - 1)
    // mono mix: mean across channels per frame, normalized to [-1, 1]
    def sampleAt(off: Int): Long = {
      // sign-extend from the top byte, accumulate the rest unsigned
      var v: Long = if (big) raw(off).toLong else raw(off + bps - 1).toLong
      var k = 1
      while (k < bps) {
        val b = if (big) raw(off + k) else raw(off + bps - 1 - k)
        v = (v << 8) | (b & 0xffL)
        k += 1
      }
      v
    }
    // mono mix: mean across channels per frame, normalized to [-1, 1]
    def monoAt(frame: Int): Double = {
      var s = 0.0
      var c = 0
      while (c < ch) {
        val v = sampleAt(frame * frameSize + c * bps)
        // unsigned PCM stores center at 2^(bits-1); drop the sign-extension
        // the reader applied by masking back to the declared width first
        val u = if (signed) v else (v & ((1L << bits) - 1)) - bias
        s += u / fullScale
        c += 1
      }
      s / ch
    }
    // RMS envelope over proportional time bins (cellBounds — a ~40-min
    // 16 kHz WAV already passes the Int-overflow line the shared rule
    // guards), each bin's frames parsed straight out of `raw` — no O(n)
    // mono buffer on the per-row hot path.
    val emb = new Array[Float](EMB_DIMS)
    var g = 0
    while (g < EMB_DIMS) {
      val (lo, hi) = cellBounds(g, n, EMB_DIMS)
      var sumSq = 0.0
      var j = lo
      while (j < hi) { val m = monoAt(j); sumSq += m * m; j += 1 }
      emb(g) = math.sqrt(sumSq / (hi - lo)).toFloat
      g += 1
    }
    Some((fmt.getSampleRate.round, ch, n, emb))
  }

  /** Frame OFFSETS `[from, until)` of an AVI container's video stream: a
    * pure RIFF chunk walk (fourcc + little-endian size + even padding),
    * recursing into LIST chunks, locating `##dc`/`##db` stream-data chunks
    * that carry a JPEG SOI — the MJPEG layout. No codec involved; malformed
    * sizes stop the walk at whatever parsed cleanly (same lenient posture
    * as the JPEG marker scan above). Offsets, not copies: the walk sees
    * EVERY frame (n_frames is the true count) but decodeVideo samples at
    * most VID_SAMPLE of them — eagerly copying each chunk would transiently
    * double a multi-hundred-MB clip on the per-row executor hot path for
    * bytes that are then never read.
    */
  private[operators] def aviFrameChunks(p: Array[Byte]): Seq[(Int, Int)] = {
    def u32le(i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def tag(i: Int, s: String): Boolean =
      s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // depth-capped: real AVIs nest LIST 2-3 deep (hdrl/strl, movi/rec);
    // crawled bytes are untrusted, and a crafted chain of nested LISTs
    // (12 bytes per level) would otherwise recurse payload/12 frames deep —
    // a StackOverflowError no NonFatal catch on the decode path survives.
    // The cursor is Long: with Int arithmetic a payload within 8 bytes of
    // Int.MaxValue (allocatable — the 400M-px image threat class) lets
    // `i + 8` wrap negative, pass the guard, and index out of bounds
    def walk(start: Long, end: Long, depth: Int): Unit = {
      if (depth > 16) return
      var i = start
      while (i + 8 <= end) {
        val ii = i.toInt // i < end <= p.length, so the cast is exact
        val size = u32le(ii + 4) // unsigned: always in [0, 0xFFFFFFFF]
        val dataEnd = i + 8 + size
        if (dataEnd > end) return // malformed/oversize chunk: stop cleanly
        if (tag(ii, "LIST")) {
          if (size >= 4) walk(i + 12, dataEnd, depth + 1) // skip the list type
        } else if ((p(ii + 2) & 0xff) == 'd'
            && ((p(ii + 3) & 0xff) == 'c' || (p(ii + 3) & 0xff) == 'b')
            && size >= 2 && (p(ii + 8) & 0xff) == 0xff
            && (p(ii + 9) & 0xff) == 0xd8) {
          out += ((ii + 8, dataEnd.toInt))
        }
        i = dataEnd + (size & 1L) // chunks pad to even offsets
      }
    }
    walk(12L, math.min(p.length.toLong, 8L + u32le(4)), 0)
    out.toSeq
  }

  /** REAL video decode + embedding for MJPEG-in-AVI payloads, no external
    * dependency: the container is pure RIFF arithmetic (`aviFrameChunks`)
    * and every frame is a JPEG the JDK codec already decodes. Returns
    * (width, height, n_frames, embedding), or None when the bytes are not
    * an AVI with at least one decodable frame (→ stub fallback).
    *
    * Frame-sample semantics (the brief's video operation): n_frames reports
    * the TRUE container frame count, but at most VID_SAMPLE evenly-spaced
    * frames are decoded (indices j·n/k, deterministic), and the embedding
    * is the per-cell mean of their luma grids — per-row cost stays bounded
    * by raster size × VID_SAMPLE regardless of clip length.
    */
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    val frames = aviFrameChunks(payload)
    val n = frames.size
    if (n == 0) return None
    val k = math.min(VID_SAMPLE, n)
    // copy ONLY the sampled frames' bytes out of the payload (the walk
    // returns offsets): per-row transient memory is bounded by the k
    // decoded frames, never by clip length
    val decoded = (0 until k).iterator
      .map { j =>
        val (from, until) = frames(j * n / k)
        decodeImage(java.util.Arrays.copyOfRange(payload, from, until))
      }
      .collect { case Some(d) => d }
      .toSeq
    if (decoded.isEmpty) None
    else {
      val (w, h, _) = decoded.head
      val emb = new Array[Float](EMB_DIMS)
      var d = 0
      while (d < EMB_DIMS) {
        var s = 0.0
        decoded.foreach(f => s += f._3(d))
        emb(d) = (s / decoded.size).toFloat
        d += 1
      }
      Some((w, h, n, emb))
    }
  }

  /** REAL image resize (the brief's resize op, completing decode /
    * feature-extract / resize / frame-sample): decode with the JDK codec,
    * box-resample each RGB channel to (outW, outH) with the same
    * proportional-cell rule as the embedding grid (cells never start past
    * the raster and always cover ≥ 1 source pixel, so downscale averages
    * and upscale degrades to nearest-neighbor duplication), and re-encode
    * PNG — lossless and deterministic, so the same payload always yields
    * byte-identical output (MultimodalSpec pins it). Returns None when the
    * payload is not a decodable image (→ callers pass the row through
    * unmodified, same posture as the decode fallbacks).
    */
  def resizeImage(payload: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    require(outW >= 1 && outH >= 1, s"resize target must be >=1x1: ${outW}x$outH")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val x0s = new Array[Int](outW)
      val x1s = new Array[Int](outW)
      var g = 0
      while (g < outW) {
        val (lo, hi) = cellBounds(g, w, outW)
        x0s(g) = lo
        x1s(g) = hi
        g += 1
      }
      val out = new java.awt.image.BufferedImage(outW, outH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rowBuf = new Array[Int](w)
      val sumR = new Array[Long](outW)
      val sumG = new Array[Long](outW)
      val sumB = new Array[Long](outW)
      var gy = 0
      while (gy < outH) {
        val (y0, y1) = cellBounds(gy, h, outH)
        java.util.Arrays.fill(sumR, 0L)
        java.util.Arrays.fill(sumG, 0L)
        java.util.Arrays.fill(sumB, 0L)
        var y = y0
        while (y < y1) {
          img.getRGB(0, y, w, 1, rowBuf, 0, w)
          var gx = 0
          while (gx < outW) {
            var x = x0s(gx)
            val x1 = x1s(gx)
            var r = 0L; var gr = 0L; var b = 0L
            while (x < x1) {
              val rgb = rowBuf(x)
              r += (rgb >> 16) & 0xff; gr += (rgb >> 8) & 0xff; b += rgb & 0xff
              x += 1
            }
            sumR(gx) += r; sumG(gx) += gr; sumB(gx) += b
            gx += 1
          }
          y += 1
        }
        var gx = 0
        while (gx < outW) {
          val nPix = (x1s(gx) - x0s(gx)).toLong * (y1 - y0)
          // round-half-up per channel: (2*sum + n) / (2*n)
          val r = ((2 * sumR(gx) + nPix) / (2 * nPix)).toInt
          val gg = ((2 * sumG(gx) + nPix) / (2 * nPix)).toInt
          val b = ((2 * sumB(gx) + nPix) / (2 * nPix)).toInt
          out.setRGB(gx, gy, (r << 16) | (gg << 8) | b)
          gx += 1
        }
        gy += 1
      }
      val buf = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(out, "png", buf)) None
      else Some(buf.toByteArray)
    }
  }

  /** Resized-media row: image rows that decoded carry the re-encoded PNG at
    * (width, height) with resized=true; everything else (non-image kinds,
    * undecodable bytes) passes through UNMODIFIED with resized=false and
    * whatever real dimensions the header parse can still recover (-1 where
    * it can't) — a resize stage must never drop or mangle rows it cannot
    * serve, only mark them.
    */
  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Int,
      resized: Boolean,
      payload: Array[Byte])

  /** The distributed resize pipeline (same mapPartitions shape and
    * partition-local codec init as extractFeatures; kind gates the decode
    * for the same cover-art reason).
    */
  def resizeImages(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      java.lang.System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val resized =
          if (r.kind == "image") resizeImage(r.payload, outW, outH) else None
        resized match {
          case Some(png) =>
            ResizedMedia(r.media_id, r.kind, outW, outH, png.length,
              resized = true, png)
          case None =>
            val (hw, hh) = (if (r.kind == "image") parseImageHeader(r.payload)
              else None)
              .map { case (_, pw, ph) => (pw, ph) }
              .getOrElse((-1, -1))
            ResizedMedia(r.media_id, r.kind, hw, hh, r.payload.length,
              resized = false, r.payload)
        }
      }
    }
  }

  /** STUB for payloads in codecs the JDK genuinely does not ship (MP3/AAC
    * audio, H.264/VP9 video, …) and for bytes that fail their kind's real
    * decoder (`decodeImage` / `decodeAudio` / `decodeVideo` above).
    * Deterministic in the payload bytes; replace with a real codec where
    * the libraries exist. Marked intentionally — do not "fix".
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

  /** Image decode with the stub fallback POSTURE as a reusable unit —
    * shared by [[extractFeatures]] and the engine's epoch-loop media stage
    * so every image consumer records identical metadata for the same
    * payload: a decodable raster yields real (w, h, luma embedding);
    * undecodable bytes fall to the stub's deterministic features, EXCEPT
    * that a still-parseable container header (truncated file) keeps its
    * REAL dimensions. Returns (width, height, embedding, decoded).
    */
  def imageFeatures(payload: Array[Byte]): (Int, Int, Array[Float], Boolean) =
    decodeImage(payload) match {
      case Some((w, h, emb)) => (w, h, emb, true)
      case None =>
        val (sw, sh, _, semb) = decodeStub(payload, "image")
        val (hw, hh) = parseImageHeader(payload)
          .map { case (_, pw, ph) => (pw, ph) }
          .getOrElse((sw, sh))
        (hw, hh, semb, false)
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
        // real decode per kind (all JDK-native: ImageIO rasters, sampled
        // PCM audio, MJPEG-AVI frame sampling); rows whose bytes don't
        // decode fall back to the stub. Kind gates the decode: an
        // audio/video payload can legitimately START with JPEG/PNG magic
        // (embedded cover art), and decoding that would silently assign
        // the artwork's features to the track.
        val (w, h, f, emb) = r.kind match {
          case "image" =>
            val (iw, ih, ie, _) = imageFeatures(r.payload)
            (iw, ih, 1, ie)
          case "audio" =>
            decodeAudio(r.payload).getOrElse(decodeStub(r.payload, "audio"))
          case "video" =>
            decodeVideo(r.payload).getOrElse(decodeStub(r.payload, "video"))
          case _ => decodeStub(r.payload, r.kind)
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
