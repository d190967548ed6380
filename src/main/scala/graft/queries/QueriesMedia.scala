package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.CanonJvm
import graft.operators.Multimodal
import Registry._

/** Oracle-checked queries over the REAL media decode path (round 5: the
  * decode/resize operators stopped being stubs — these put them under the
  * driver's DuckDB gate, not just MultimodalSpec).
  *
  * The trick both queries share: synthesize payloads whose decoded features
  * are EXACTLY predictable in SQL. A solid-color image survives box
  * resampling bit-for-bit (the round-half-up average of n equal channel
  * values is that value), and a constant PCM waveform whose amplitude is a
  * power of two has an RMS envelope that is exact in binary floating point
  * (every intermediate — v/2^15, its square, integer-multiple sums, the
  * mean, the square root — is representable), so DuckDB can state the
  * expected output without ever touching a codec.
  */
object QueriesMedia {

  /** Deterministic 44-byte-header mono 16-bit little-endian PCM WAV holding
    * `n` frames of the constant sample `v` (the canonical RIFF/WAVE layout
    * the reference's media fixtures also use — a real container, parsed by
    * the JDK's own reader, not by our code).
    */
  private def wavOf(rate: Int, n: Int, v: Short): Array[Byte] = {
    val data = 2 * n
    val bb = java.nio.ByteBuffer.allocate(44 + data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(data)
    var i = 0
    while (i < n) { bb.putShort(v); i += 1 }
    bb.array()
  }

  private def solidOf(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def pngOf(w: Int, h: Int, rgb: Int): Array[Byte] =
    solidOf(w, h, rgb, "png")

  /** Deterministic MJPEG-in-AVI container: the frames as `00dc` chunks
    * inside a `movi` LIST (the canonical layout `aviFrameChunks` walks —
    * RIFF fourcc + little-endian size + even padding throughout). Like
    * `wavOf`, this synthesizes a REAL container parsed by the production
    * walker, not a mock of it.
    */
  private def aviOf(frames: Seq[Array[Byte]]): Array[Byte] = {
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffSize = 4 + 8 + moviSize
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(moviSize)
      .put("movi".getBytes("US-ASCII"))
    frames.foreach { f =>
      bb.put("00dc".getBytes("US-ASCII")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
    }
    bb.array()
  }

  /** (r, g, b) if every pixel of the decoded payload carries one color,
    * (-1,-1,-1) when the bytes don't decode, (-2,-2,-2) on a non-uniform
    * raster (which would mean the resample corrupted a solid fill).
    */
  private def uniformColor(payload: Array[Byte]): (Long, Long, Long) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) (-1L, -1L, -1L)
    else {
      val first = img.getRGB(0, 0)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          if (img.getRGB(x, y) != first) return (-2L, -2L, -2L)
          x += 1
        }
        y += 1
      }
      (((first >> 16) & 0xff).toLong, ((first >> 8) & 0xff).toLong,
        (first & 0xff).toLong)
    }
  }

  /** q50: the image RESIZE operator end-to-end under the DuckDB gate —
    * synthesize a solid-color PNG per doc (color and source dims md5-derived
    * so DuckDB can restate them), run the distributed resize to 4×4, then
    * RE-DECODE the emitted payload and report the uniform color. Three
    * deterministic row classes pin the full routing contract:
    * doc_id%5==0 → audio kind carrying PNG bytes (the cover-art hazard: must
    * pass through untouched), %5==1 → image kind with undecodable bytes
    * (passthrough, dims unrecoverable), else → a real resize. Dims, resized
    * flag, and the output pixels are all exactly predictable.
    */
  private val q50 = Q("q50_mm_resize_oracle",
    (s, dir) => {
      import s.implicits._
      val ids = tblSpread(s, dir, "documents").select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        java.lang.System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val r = (CanonJvm.md5Long(id + "q50r") % 256).toInt
          val g = (CanonJvm.md5Long(id + "q50g") % 256).toInt
          val b = (CanonJvm.md5Long(id + "q50b") % 256).toInt
          val w = 1 + (CanonJvm.md5Long(id + "q50w") % 37).toInt
          val h = 1 + (CanonJvm.md5Long(id + "q50h") % 29).toInt
          val kind = if (id % 5 == 0) "audio" else "image"
          val payload =
            if (id % 5 == 1) s"not an image $id".getBytes("UTF-8")
            else pngOf(w, h, (r << 16) | (g << 8) | b)
          Multimodal.MediaRow(id, kind, payload)
        }
      }
      Multimodal.resizeImages(media, 4, 4)
        .mapPartitions { it =>
          java.lang.System.setProperty("java.awt.headless", "true")
          javax.imageio.ImageIO.setUseCache(false)
          it.map { rm =>
            val (r, g, b) = uniformColor(rm.payload)
            (rm.media_id, rm.width.toLong, rm.height.toLong,
              if (rm.resized) 1L else 0L, r, g, b)
          }
        }
        .toDF("doc_id", "width", "height", "resized", "red", "green", "blue")
        .orderBy("doc_id")
    },
    Some(
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 5 IN (0, 1) THEN -1 ELSE 4 END AS width,
         |  CASE WHEN doc_id % 5 IN (0, 1) THEN -1 ELSE 4 END AS height,
         |  CASE WHEN doc_id % 5 IN (0, 1) THEN 0 ELSE 1 END AS resized,
         |  CASE WHEN doc_id % 5 = 1 THEN -1
         |    ELSE ${duckMd5Long("doc_id::VARCHAR||'q50r'")} % 256 END AS red,
         |  CASE WHEN doc_id % 5 = 1 THEN -1
         |    ELSE ${duckMd5Long("doc_id::VARCHAR||'q50g'")} % 256 END AS green,
         |  CASE WHEN doc_id % 5 = 1 THEN -1
         |    ELSE ${duckMd5Long("doc_id::VARCHAR||'q50b'")} % 256 END AS blue
         |FROM documents ORDER BY doc_id""".stripMargin))

  /** q51: the real AUDIO decode end-to-end under the DuckDB gate — one
    * constant-amplitude WAV per doc (rate / frame count / amplitude all
    * md5-derived), decoded through the full extractFeatures Dataset stage.
    * Amplitudes are powers of two (2^8..2^14), so every RMS bin equals
    * v/2^15 EXACTLY (all intermediates representable) and scaling the
    * envelope's min and max back by 2^15 must return the integer amplitude
    * on both ends — any parse, mixing, or binning defect breaks the
    * equality.
    */
  private val q51 = Q("q51_mm_audio_envelope",
    (s, dir) => {
      import s.implicits._
      val ids = tblSpread(s, dir, "documents").select(col("doc_id")).as[Long]
      val media = ids.map { id =>
        val rate = 8000 + (CanonJvm.md5Long(id + "q51s") % 8).toInt * 1000
        val n = 64 + (CanonJvm.md5Long(id + "q51n") % 1000).toInt
        val v = 1 << (8 + (CanonJvm.md5Long(id + "q51v") % 7).toInt)
        Multimodal.MediaRow(id, "audio", wavOf(rate, n, v.toShort))
      }
      Multimodal.extractFeatures(media)
        .map { f =>
          (f.media_id, f.width.toLong, f.height.toLong, f.n_frames.toLong,
            math.round(f.embedding.min * 32768.0),
            math.round(f.embedding.max * 32768.0))
        }
        .toDF("doc_id", "sample_rate", "channels", "n_frames",
          "amp_lo", "amp_hi")
        .orderBy("doc_id")
    },
    Some(
      s"""SELECT doc_id,
         |  8000 + ${duckMd5Long("doc_id::VARCHAR||'q51s'")} % 8 * 1000 AS sample_rate,
         |  1 AS channels,
         |  64 + ${duckMd5Long("doc_id::VARCHAR||'q51n'")} % 1000 AS n_frames,
         |  1::BIGINT << (8 + ${duckMd5Long("doc_id::VARCHAR||'q51v'")} % 7) AS amp_lo,
         |  1::BIGINT << (8 + ${duckMd5Long("doc_id::VARCHAR||'q51v'")} % 7) AS amp_hi
         |FROM documents ORDER BY doc_id""".stripMargin))

  /** q52: the real VIDEO decode (MJPEG-in-AVI) end-to-end under the DuckDB
    * gate — one synthetic AVI per doc whose frames are solid-GRAY JPEGs
    * (gray per frame, dims and frame count all md5-derived). Grays are the
    * exactness trick this time: a uniform gray raster round-trips the JDK
    * JPEG codec bit-for-bit (RGB(v,v,v) → Y=v exactly since the Rec.601
    * weights sum to 1, chroma sits at the 128 center, and the constant
    * block's only nonzero DCT coefficient is a DC the quant table divides —
    * verified for all 256 values × five raster shapes in this sandbox), so
    * every sampled frame's luma grid is exactly v/255 and the clip
    * embedding is the mean over the VID_SAMPLE evenly-spaced frame indices
    * j·n/k. Scaling the envelope's min and max back by 255·k must return
    * the integer SUM of the sampled grays on both ends — which pins the
    * container walk, the frame-SAMPLE selection rule (which indices), the
    * per-frame pixel decode, and the mean, all from SQL: DuckDB restates
    * the sum over the same indices with a `range(8)`/`j < k` lateral.
    * n_frames must report the TRUE container count even when only k=8 of
    * n frames decode.
    */
  private val q52 = Q("q52_mm_video_frames",
    (s, dir) => {
      import s.implicits._
      val ids = tblSpread(s, dir, "documents").select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        java.lang.System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = 8 + (CanonJvm.md5Long(id + "q52w") % 25).toInt
          val h = 8 + (CanonJvm.md5Long(id + "q52h") % 25).toInt
          val n = 1 + (CanonJvm.md5Long(id + "q52n") % 20).toInt
          val frames = (0 until n).map { f =>
            val v = (CanonJvm.md5Long(id + "q52f" + f) % 256).toInt
            solidOf(w, h, (v << 16) | (v << 8) | v, "jpg")
          }
          Multimodal.MediaRow(id, "video", aviOf(frames))
        }
      }
      Multimodal.extractFeatures(media)
        .map { ft =>
          val k = math.min(Multimodal.VID_SAMPLE, ft.n_frames)
          (ft.media_id, ft.width.toLong, ft.height.toLong, ft.n_frames.toLong,
            math.round(ft.embedding.min * 255.0 * k),
            math.round(ft.embedding.max * 255.0 * k))
        }
        .toDF("doc_id", "width", "height", "n_frames",
          "gray_sum_lo", "gray_sum_hi")
        .orderBy("doc_id")
    },
    Some(
      s"""WITH p AS (
         |  SELECT doc_id,
         |    8 + ${duckMd5Long("doc_id::VARCHAR||'q52w'")} % 25 AS width,
         |    8 + ${duckMd5Long("doc_id::VARCHAR||'q52h'")} % 25 AS height,
         |    1 + ${duckMd5Long("doc_id::VARCHAR||'q52n'")} % 20 AS n_frames
         |  FROM documents),
         |k AS (SELECT *, LEAST(8, n_frames) AS k FROM p)
         |SELECT doc_id, width, height, n_frames,
         |  (SELECT SUM(${duckMd5Long("k.doc_id::VARCHAR||'q52f'||(t.j * k.n_frames // k.k)")} % 256)::BIGINT
         |   FROM range(8) t(j) WHERE t.j < k.k) AS gray_sum_lo,
         |  (SELECT SUM(${duckMd5Long("k.doc_id::VARCHAR||'q52f'||(t.j * k.n_frames // k.k)")} % 256)::BIGINT
         |   FROM range(8) t(j) WHERE t.j < k.k) AS gray_sum_hi
         |FROM k ORDER BY doc_id""".stripMargin))

  val qs: Seq[Q] = Seq(q50, q51, q52)
}
