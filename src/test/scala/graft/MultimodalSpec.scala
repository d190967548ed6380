package graft

import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, partition-local decode stub,
  * deterministic features, and stability under repartitioning.
  */
class MultimodalSpec extends SparkSpecBase {

  test("feature extraction is deterministic and partitioning-invariant") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> ((f.n_bytes, f.width, f.height, f.n_frames,
        f.embedding.toSeq))).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect()
      .map(f => f.media_id -> ((f.n_bytes, f.width, f.height, f.n_frames,
        f.embedding.toSeq))).toMap
    assert(f1 == f2)
    assert(f1.size == docs.count())
    // schema sanity: bytes equal utf-8 length of the standing-in text
    val textLens = docs.selectExpr("doc_id", "octet_length(cast(text as binary))")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    f1.foreach { case (id, (nBytes, w, h, fr, emb)) =>
      assert(nBytes == textLens(id))
      assert(w >= 64 && w < 1024 && h >= 64 && h < 1024)
      assert(fr >= 1 && fr <= 30)
      assert(emb.length == Multimodal.EMB_DIMS)
    }
  }

  /** Real container bytes for the header-parse tests: a minimal JPEG
    * marker stream (SOI, APP0, DQT filler, SOF0, SOS) and a PNG
    * signature+IHDR — byte-for-byte what a codec would emit for the
    * metadata prefix.
    */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def u16(x: Int) = Seq((x >> 8) & 0xff, x & 0xff)
    (Seq(0xff, 0xd8) ++                           // SOI
      Seq(0xff, 0xe0, 0x00, 0x10) ++ Seq.fill(14)(0x4a) ++ // APP0 len 16
      Seq(0xff, 0xdb, 0x00, 0x43) ++ Seq.fill(0x41)(0x11) ++ // DQT len 67
      (Seq(0xff, 0xc0, 0x00, 0x11, 0x08) ++ u16(h) ++ u16(w) ++
        Seq.fill(10)(0x22)) ++                    // SOF0 len 17
      Seq(0xff, 0xda, 0x00, 0x08) ++ Seq.fill(20)(0x99) // SOS + entropy data
      ).map(_.toByte).toArray
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def u32(x: Int) = Seq((x >> 24) & 0xff, (x >> 16) & 0xff, (x >> 8) & 0xff, x & 0xff)
    (Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      u32(13) ++ Seq('I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt) ++
      u32(w) ++ u32(h) ++ Seq(8, 2, 0, 0, 0) ++ u32(0)
      ).map(_.toByte).toArray
  }

  test("JPEG SOF0 and PNG IHDR headers parse to real width/height (no codec library)") {
    assert(Multimodal.parseImageHeader(jpegBytes(1920, 1080)) ===
      Some(("jpeg", 1920, 1080)))
    assert(Multimodal.parseImageHeader(jpegBytes(292, 292)) ===
      Some(("jpeg", 292, 292)))
    assert(Multimodal.parseImageHeader(pngBytes(640, 480)) ===
      Some(("png", 640, 480)))
    // non-image payloads fall through to the stub path
    assert(Multimodal.parseImageHeader("just some text".getBytes) === None)
    assert(Multimodal.parseImageHeader(Array[Byte](0xff.toByte, 0xd8.toByte)) === None)
    assert(Multimodal.parseImageHeader(Array.empty[Byte]) === None)
  }

  test("extractFeatures uses parsed header dims for real image payloads, stub otherwise") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", jpegBytes(800, 600)),
      Multimodal.MediaRow(2L, "image", pngBytes(1024, 768)),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes),
      // an audio payload that STARTS with a JPEG container (embedded cover
      // art): the header parse must not hijack a non-image row's dims
      Multimodal.MediaRow(4L, "audio", jpegBytes(300, 300))).toDS()
    val got = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got(1L) === ((800, 600)))
    assert(got(2L) === ((1024, 768)))
    // stub dims are in [64, 1024)
    assert(got(3L)._1 >= 64 && got(3L)._1 < 1024)
    assert(got(4L) !== ((300, 300)),
      "audio row took its cover art's dimensions")
  }

  /** A real encoded image (JDK codec round-trip): a deterministic
    * horizontal gradient so the luma embedding has checkable structure.
    */
  private def encodedImage(fmt: String, w: Int, h: Int,
      shade: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = shade(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  test("real pixel decode: decoded dims equal header-parsed dims for JDK-encoded PNG and JPEG") {
    for (fmt <- Seq("png", "jpg"); (w, h) <- Seq((320, 200), (37, 11), (5, 3))) {
      val bytes = encodedImage(fmt, w, h, (x, y) => (x * 7 + y * 13) % 256)
      val Some((dw, dh, emb)) = Multimodal.decodeImage(bytes)
      val Some((hdrFmt, hw, hh)) = Multimodal.parseImageHeader(bytes)
      assert((dw, dh) === ((w, h)), s"$fmt decode dims")
      assert((hw, hh) === ((w, h)), s"$fmt header dims")
      assert(hdrFmt === (if (fmt == "png") "png" else "jpeg"))
      assert(emb.length === Multimodal.EMB_DIMS)
      assert(emb.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("bulk-row decode is bit-identical to an independent per-pixel twin") {
    // decodeImage reads scanlines via bulk getRGB; this twin recomputes the
    // 8x8 box-averaged luma with the naive per-pixel overload and the same
    // cell bounds/accumulation order — any drift in the bulk rework (row
    // offsets, overlapping sub-8px cells, sum order) fails exact equality
    def twin(bytes: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (w, h) = (img.getWidth, img.getHeight)
      val G = Multimodal.EMB_GRID
      Array.tabulate(Multimodal.EMB_DIMS) { i =>
        val (gy, gx) = (i / G, i % G)
        val y0 = gy * h / G
        val y1 = math.min(h, math.max((gy + 1) * h / G, y0 + 1))
        val x0 = gx * w / G
        val x1 = math.min(w, math.max((gx + 1) * w / G, x0 + 1))
        var sum = 0.0
        for (y <- y0 until y1; x <- x0 until x1) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        }
        (sum / ((x1 - x0).toLong * (y1 - y0) * 255.0)).toFloat
      }
    }
    // spans the regimes: big cells, non-divisible dims, sub-8px rasters
    // (overlapping cells), single pixel; jpg exercises a lossy decode too
    for ((fmt, w, h) <- Seq(("png", 64, 64), ("png", 37, 11), ("png", 5, 3),
        ("png", 1, 1), ("jpg", 40, 24))) {
      val bytes = encodedImage(fmt, w, h, (x, y) => (x * 31 + y * 17) % 256)
      val got = Multimodal.decodeImage(bytes).get._3
      assert(got.toSeq == twin(bytes).toSeq, s"$fmt ${w}x$h diverged")
    }
  }

  test("luma embedding reflects actual pixel content (not a byte hash)") {
    val black = Multimodal.decodeImage(
      encodedImage("png", 64, 64, (_, _) => 0)).get._3
    val white = Multimodal.decodeImage(
      encodedImage("png", 64, 64, (_, _) => 255)).get._3
    assert(black.forall(_ < 0.02f))
    assert(white.forall(_ > 0.98f))
    // left-dark / right-bright split: each grid row's leftmost cell is
    // darker than its rightmost
    val split = Multimodal.decodeImage(
      encodedImage("png", 64, 64, (x, _) => if (x < 32) 0 else 255)).get._3
    for (gy <- 0 until Multimodal.EMB_GRID) {
      assert(split(gy * Multimodal.EMB_GRID) < 0.1f)
      assert(split(gy * Multimodal.EMB_GRID + Multimodal.EMB_GRID - 1) > 0.9f)
    }
    // JPEG is lossy but the gross structure must survive the round-trip
    val splitJpg = Multimodal.decodeImage(
      encodedImage("jpg", 64, 64, (x, _) => if (x < 32) 0 else 255)).get._3
    for (gy <- 0 until Multimodal.EMB_GRID) {
      assert(splitJpg(gy * Multimodal.EMB_GRID) <
        splitJpg(gy * Multimodal.EMB_GRID + Multimodal.EMB_GRID - 1))
    }
  }

  test("decoded image embeddings feed the ANN top-k shape (q28/q30 contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // 20 real images: two visual clusters (dark gradient vs bright gradient)
    val media = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) 0 else 200
      Multimodal.MediaRow(i, "image",
        encodedImage("png", 48, 48, (x, y) => base + ((x + y + i.toInt) % 55)))
    }.toDS()
    val feats = Multimodal.extractFeatures(media)
      .select(col("media_id"), transform(col("embedding"),
        x => x.cast("double")).as("vec"))
    // same 64-dim shape the embeddings table feeds q28/q30; same codegen'd
    // dot-product expression
    val q = feats.select(col("media_id").as("q_id"), col("vec").as("q_vec"))
      .filter(col("q_id") < 4)
    // cosine, not raw dot: luma vectors are all-positive, so magnitude
    // (overall brightness) would otherwise dominate shape
    val scored = q.crossJoin(feats.filter(col("media_id") >= 4))
      .withColumn("sim", graft.plans.DotProduct(col("q_vec"), col("vec")) /
        sqrt(graft.plans.DotProduct(col("q_vec"), col("q_vec")) *
          graft.plans.DotProduct(col("vec"), col("vec"))))
    val top1 = scored.withColumn("rk",
        row_number().over(Window.partitionBy("q_id").orderBy(
          col("sim").desc, col("media_id"))))
      .filter(col("rk") === 1)
      .select("q_id", "media_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1.size === 4)
    // nearest neighbor of each query lands in its own visual cluster
    top1.foreach { case (qid, nn) => assert(qid % 2 === nn % 2,
      s"query $qid matched cross-cluster neighbor $nn") }
  }

  /** Real encoded audio (JDK codec round-trip): raw PCM frames wrapped in a
    * container by `javax.sound.sampled` itself — byte-for-byte what a codec
    * would emit.
    */
  private def encodedAudio(fileType: javax.sound.sampled.AudioFileFormat.Type,
      pcm: Array[Byte], rate: Int, bits: Int, channels: Int,
      signed: Boolean, bigEndian: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate.toFloat, bits, channels, signed, bigEndian)
    val frames = pcm.length / fmt.getFrameSize
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, fileType, out)
    out.toByteArray
  }

  /** 16-bit little-endian PCM: loud full-scale-ish sine for the first half,
    * digital silence for the second — the RMS envelope has checkable shape.
    */
  private def sinePcm16(n: Int, rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 28000).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    pcm
  }

  test("real audio decode: WAV PCM metadata and RMS envelope from the JDK codec") {
    import javax.sound.sampled.AudioFileFormat.Type
    val (n, rate) = (6400, 8000) // n divisible by EMB_DIMS: clean bin halves
    val wav = encodedAudio(Type.WAVE, sinePcm16(n, rate), rate, 16, 1,
      signed = true, bigEndian = false)
    val Some((gotRate, ch, frames, emb)) = Multimodal.decodeAudio(wav)
    assert((gotRate, ch, frames) === ((rate, 1, n)))
    assert(emb.length === Multimodal.EMB_DIMS)
    assert(emb.forall(v => v >= 0f && v <= 1f))
    // loud first half (sine RMS ≈ amplitude/√2 ≈ 0.6), silent second half
    val half = Multimodal.EMB_DIMS / 2
    assert(emb.take(half).forall(_ > 0.3f), "loud half too quiet")
    assert(emb.drop(half).forall(_ < 0.01f), "silent half not silent")
    // mono mix is the channel mean: L = -R cancels to digital silence
    val l = sinePcm16(n, rate)
    val stereo = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val s = ((l(2 * i) & 0xff) | (l(2 * i + 1) << 8)).toShort
      val neg = (-s).toShort
      stereo(4 * i) = (s & 0xff).toByte
      stereo(4 * i + 1) = ((s >> 8) & 0xff).toByte
      stereo(4 * i + 2) = (neg & 0xff).toByte
      stereo(4 * i + 3) = ((neg >> 8) & 0xff).toByte
    }
    val wavSt = encodedAudio(Type.WAVE, stereo, rate, 16, 2,
      signed = true, bigEndian = false)
    val Some((_, ch2, frames2, emb2)) = Multimodal.decodeAudio(wavSt)
    assert((ch2, frames2) === ((2, n)))
    assert(emb2.forall(_ < 1e-6f), "opposite-phase stereo must mix to silence")
    // non-audio bytes fall through to the stub path
    assert(Multimodal.decodeAudio("just some text".getBytes) === None)
    assert(Multimodal.decodeAudio(Array.empty[Byte]) === None)
  }

  test("audio embedding is container-independent: WAV == AIFF == AU on the same PCM") {
    import javax.sound.sampled.AudioFileFormat.Type
    val (n, rate) = (3001, 11025) // odd count: exercises uneven bins too
    val pcmLe = sinePcm16(n, rate)
    // AIFF/AU carry big-endian samples: same values, swapped bytes
    val pcmBe = new Array[Byte](pcmLe.length)
    for (i <- 0 until n) {
      pcmBe(2 * i) = pcmLe(2 * i + 1)
      pcmBe(2 * i + 1) = pcmLe(2 * i)
    }
    val wav = Multimodal.decodeAudio(encodedAudio(Type.WAVE, pcmLe, rate, 16, 1,
      signed = true, bigEndian = false))
    val aiff = Multimodal.decodeAudio(encodedAudio(Type.AIFF, pcmBe, rate, 16, 1,
      signed = true, bigEndian = true))
    val au = Multimodal.decodeAudio(encodedAudio(Type.AU, pcmBe, rate, 16, 1,
      signed = true, bigEndian = true))
    assert(wav.isDefined && aiff.isDefined && au.isDefined)
    val Some((r1, c1, f1, e1)) = wav
    assert((r1, c1, f1) === ((rate, 1, n)))
    // bit-identical embeddings: the manual PCM parse normalizes away both
    // endianness and container framing
    assert(e1.toSeq == aiff.get._4.toSeq, "WAV vs AIFF drifted")
    assert(e1.toSeq == au.get._4.toSeq, "WAV vs AU drifted")
    assert(aiff.get._1 === rate && au.get._1 === rate)
  }

  test("8-bit unsigned PCM WAV decodes through the manual sample parser") {
    import javax.sound.sampled.AudioFileFormat.Type
    val n = 1280
    // first half: full-swing alternating 0/255; second half: center (128),
    // which IS digital silence in unsigned 8-bit
    val pcm = Array.tabulate(n)(i =>
      (if (i < n / 2) (if (i % 2 == 0) 0 else 255) else 128).toByte)
    val wav = encodedAudio(Type.WAVE, pcm, 8000, 8, 1,
      signed = false, bigEndian = false)
    val Some((rate, ch, frames, emb)) = Multimodal.decodeAudio(wav)
    assert((rate, ch, frames) === ((8000, 1, n)))
    val half = Multimodal.EMB_DIMS / 2
    assert(emb.take(half).forall(_ > 0.9f), "full-swing half should be ~1")
    assert(emb.drop(half).forall(_ < 1e-6f), "center-value half is silence")
  }

  test("audio past 33.5M frames: bin arithmetic must not overflow Int") {
    import javax.sound.sampled.AudioFileFormat.Type
    // 40M frames of 8-bit mono (~40 MB WAV): g*n exceeds Int.MaxValue from
    // bin 54 up — unguarded Int arithmetic corrupts the tail bins and then
    // throws AIOOBE out of the decode instead of computing the envelope
    val n = 40_000_000
    val pcm = new Array[Byte](n)
    var i = 0
    while (i < n / 2) { pcm(i) = (if (i % 2 == 0) 0 else 255).toByte; i += 1 }
    while (i < n) { pcm(i) = 128.toByte; i += 1 } // unsigned-8 silence
    val wav = encodedAudio(Type.WAVE, pcm, 8000, 8, 1,
      signed = false, bigEndian = false)
    val Some((rate, ch, frames, emb)) = Multimodal.decodeAudio(wav)
    assert((rate, ch, frames) === ((8000, 1, n)))
    val half = Multimodal.EMB_DIMS / 2
    assert(emb.take(half).forall(_ > 0.9f), "full-swing half should be ~1")
    assert(emb.drop(half).forall(_ < 1e-6f),
      "tail bins must cover the silent half exactly (overflow corrupts them)")
  }

  test("deeply nested LIST chains are depth-capped, not a stack overflow") {
    // a crafted AVI of 100k self-consistent nested LISTs (12 bytes/level):
    // crawled media bytes are untrusted, and an unbounded walk recurses
    // once per level — StackOverflowError is not NonFatal and would kill
    // the task instead of stub-falling-back
    val levels = 100000
    def sizeAt(k: Int) = 12 * k - 8 // innermost LIST size 4, +12 per level
    val total = 12 + 8 + sizeAt(levels)
    val p = new Array[Byte](total)
    def put(off: Int, s: String): Unit =
      s.indices.foreach(k => p(off + k) = s.charAt(k).toByte)
    def putU32le(off: Int, x: Int): Unit = {
      p(off) = (x & 0xff).toByte; p(off + 1) = ((x >> 8) & 0xff).toByte
      p(off + 2) = ((x >> 16) & 0xff).toByte; p(off + 3) = ((x >> 24) & 0xff).toByte
    }
    put(0, "RIFF"); putU32le(4, 4 + 8 + sizeAt(levels)); put(8, "AVI ")
    var off = 12
    var k = levels
    while (k >= 1) {
      put(off, "LIST"); putU32le(off + 4, sizeAt(k)); put(off + 8, "movi")
      off += 12; k -= 1
    }
    assert(Multimodal.decodeVideo(p) === None) // no frames, no crash
    // the cap must not break REAL nesting: frames one LIST deeper than
    // movi (the rec-grouped layout) still parse
    val frame = encodedImage("jpg", 16, 12, (x, y) => (x * 5 + y) % 256)
    def u32le(x: Int) = Array[Byte]((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ u32le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val rec = list("rec ", chunk("00dc", frame))
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", new Array[Byte](56))) ++ list("movi", rec)
    val nested = "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
    val Some((w, h, nf, _)) = Multimodal.decodeVideo(nested)
    assert((w, h, nf) === ((16, 12, 1)))
  }

  /** A real MJPEG-in-AVI container: RIFF('AVI '){ LIST(hdrl){avih}
    * LIST(movi){ 00dc <jpeg> ... } } — the exact layout `aviFrameChunks`
    * walks, with JDK-encoded JPEG frames.
    */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def u32le(x: Int) = Array[Byte]((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] =
      tag.getBytes("US-ASCII") ++ u32le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
  }

  test("real video decode: MJPEG-in-AVI frames count, decode, and average") {
    val frames = (0 until 6).map(j =>
      encodedImage("jpg", 32, 24, (x, y) => (j * 40 + x + y) % 256))
    val avi = aviBytes(frames)
    val Some((w, h, n, emb)) = Multimodal.decodeVideo(avi)
    assert((w, h, n) === ((32, 24, 6)))
    // 6 ≤ VID_SAMPLE: every frame decodes; embedding is the exact per-cell
    // mean of the single-frame luma grids (same double-sum order)
    val twin = {
      val embs = frames.map(f => Multimodal.decodeImage(f).get._3)
      Array.tabulate(Multimodal.EMB_DIMS) { d =>
        var s = 0.0
        embs.foreach(e => s += e(d))
        (s / embs.size).toFloat
      }
    }
    assert(emb.toSeq == twin.toSeq)
    // non-AVI bytes and frame-less containers fall through to the stub path
    assert(Multimodal.decodeVideo("just some text".getBytes) === None)
    assert(Multimodal.decodeVideo(aviBytes(Nil)) === None)
    // a container whose frames aren't decodable JPEG is also a fallback
    assert(Multimodal.decodeVideo(aviBytes(Seq(Array[Byte](0xff.toByte,
      0xd8.toByte, 0x00, 0x00)))) === None)
  }

  test("long clips sample at most VID_SAMPLE evenly-spaced frames") {
    val n = 20
    val frames = (0 until n).map(j =>
      encodedImage("jpg", 16, 16, (x, y) => (j * 12 + x * 3 + y) % 256))
    val Some((_, _, gotN, emb)) = Multimodal.decodeVideo(aviBytes(frames))
    assert(gotN === n, "n_frames reports the true container count")
    val k = Multimodal.VID_SAMPLE
    val sampled = (0 until k).map(j => frames(j * n / k))
    val twin = {
      val embs = sampled.map(f => Multimodal.decodeImage(f).get._3)
      Array.tabulate(Multimodal.EMB_DIMS) { d =>
        var s = 0.0
        embs.foreach(e => s += e(d))
        (s / embs.size).toFloat
      }
    }
    assert(emb.toSeq == twin.toSeq,
      "embedding must average exactly the deterministic sample indices")
  }

  test("extractFeatures routes real audio/video payloads to their decoders") {
    import javax.sound.sampled.AudioFileFormat.Type
    import spark.implicits._
    val wav = encodedAudio(Type.WAVE, sinePcm16(1600, 16000), 16000, 16, 1,
      signed = true, bigEndian = false)
    val avi = aviBytes((0 until 3).map(j =>
      encodedImage("jpg", 20, 10, (x, y) => (j * 50 + x + y) % 256)))
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav),
      Multimodal.MediaRow(2L, "video", avi),
      Multimodal.MediaRow(3L, "audio", "not audio".getBytes),
      Multimodal.MediaRow(4L, "video", "not video".getBytes)).toDS()
    val got = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // audio: (sample_rate, channels, pcm frames)
    assert((got(1L).width, got(1L).height, got(1L).n_frames) ===
      ((16000, 1, 1600)))
    // video: (pixels, pixels, container frames)
    assert((got(2L).width, got(2L).height, got(2L).n_frames) === ((20, 10, 3)))
    // undecodable bytes keep the stub's synthetic ranges
    for (id <- Seq(3L, 4L)) {
      assert(got(id).width >= 64 && got(id).width < 1024)
      assert(got(id).height >= 64 && got(id).height < 1024)
    }
  }

  test("video rows get multi-frame counts, images single") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .collect()
    assert(feats.filter(_.kind != "video").forall(_.n_frames == 1))
    assert(feats.exists(f => f.kind == "video" && f.n_frames > 1))
  }

  test("resize: output dims, PNG round-trip, exact box means, determinism") {
    val src = encodedImage("png", 320, 200, (x, y) => (x * 7 + y * 13) % 256)
    val Some(out) = Multimodal.resizeImage(src, 64, 40)
    // the output is itself a decodable PNG at exactly the target dims
    assert(Multimodal.parseImageHeader(out).map(_._1) === Some("png"))
    val Some((w, h, _)) = Multimodal.decodeImage(out)
    assert((w, h) === ((64, 40)))
    // byte-identical across calls: PNG is lossless and the JDK encoder is
    // deterministic, so resize output can live in a content-addressed store
    assert(Multimodal.resizeImage(src, 64, 40).get.toSeq == out.toSeq)
    // exact means: a 2x-duplicated raster box-averages back to its original
    // pixels (every 2x2 cell is constant, so the average IS the pixel)
    val small = encodedImage("png", 16, 16, (x, y) => (x * 31 + y * 17) % 256)
    val doubled = encodedImage("png", 32, 32, (x, y) => ((x / 2) * 31 + (y / 2) * 17) % 256)
    val Some(backBytes) = Multimodal.resizeImage(doubled, 16, 16)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(backBytes))
    val orig = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    for (y <- 0 until 16; x <- 0 until 16)
      assert((back.getRGB(x, y) & 0xffffff) === (orig.getRGB(x, y) & 0xffffff),
        s"box mean at ($x,$y)")
    // upscale degrades to nearest-neighbor duplication (cells cover >= 1 px)
    val Some(upBytes) = Multimodal.resizeImage(small, 32, 32)
    val up = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(upBytes))
    for (y <- 0 until 32; x <- 0 until 32)
      assert((up.getRGB(x, y) & 0xffffff) === (orig.getRGB(x / 2, y / 2) & 0xffffff),
        s"upscale at ($x,$y)")
    // undecodable bytes are a None, not an exception
    assert(Multimodal.resizeImage("not an image".getBytes, 8, 8) === None)
  }

  test("resizeImages: image rows re-encode at target dims, others pass through untouched") {
    import spark.implicits._
    val jpeg = encodedImage("jpg", 100, 60, (x, y) => (x + y) % 256)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", jpeg),
      Multimodal.MediaRow(2L, "image", "corrupt".getBytes),
      // truncated container: undecodable but header-parseable — real dims
      // must still surface on the passthrough row
      Multimodal.MediaRow(3L, "image", jpegBytes(800, 600)),
      // cover-art hazard: an image payload under a non-image kind must not
      // be resized (same gate as extractFeatures)
      Multimodal.MediaRow(4L, "audio", jpeg)).toDS()
    val got = Multimodal.resizeImages(media, 16, 16).collect()
      .map(r => r.media_id -> r).toMap
    assert(got(1L).resized && (got(1L).width, got(1L).height) === ((16, 16)))
    assert(Multimodal.decodeImage(got(1L).payload).map(d => (d._1, d._2)) ===
      Some((16, 16)))
    assert(got(1L).n_bytes === got(1L).payload.length)
    for (id <- Seq(2L, 3L, 4L)) assert(!got(id).resized)
    assert(got(2L).payload.toSeq == "corrupt".getBytes.toSeq)
    assert((got(3L).width, got(3L).height) === ((800, 600)))
    assert(got(4L).payload.toSeq == jpeg.toSeq)
    assert((got(2L).width, got(2L).height) === ((-1, -1)))
    // partitioning invariance, like extractFeatures
    val again = Multimodal.resizeImages(media.repartition(3), 16, 16).collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    assert(again === got.view.mapValues(_.payload.toSeq).toMap)
  }

  test("cellBounds: the shared grid rule survives hostile dimensions and keeps its invariants") {
    // 7 * 400M overflows Int: the pre-shared decodeImage inlined this rule
    // in Int arithmetic, so a hostile ~400M-px dimension (allocatable on a
    // large heap) sent x0s negative and threw AIOOBE out of the task
    // instead of stub-falling-back
    val n = 400000000
    var prevHi = 0
    (0 until 8).foreach { g =>
      val (lo, hi) = Multimodal.cellBounds(g, n, 8)
      assert(lo == (g.toLong * n / 8).toInt, s"cell $g start")
      assert(lo >= 0 && hi > lo && hi <= n, s"cell $g bounds")
      assert(lo == prevHi, s"cell $g gapless tiling")
      prevHi = hi
    }
    assert(prevHi == n, "cells cover the input exactly")
    // sub-grid inputs: every cell still covers >= 1 unit, never past n
    (0 until 8).foreach { g =>
      val (lo, hi) = Multimodal.cellBounds(g, 3, 8)
      assert(hi == lo + 1 && lo >= 0 && hi <= 3, s"sub-grid cell $g")
    }
  }

  test("audio payloads beyond MaxAudioBytes route to the stub instead of materializing") {
    // an over-cap payload must be REFUSED by a length check before any
    // parse or allocation: the readAllBytes materialization would turn a
    // multi-GB crawled payload into an OutOfMemoryError, which is an Error
    // — it passes the NonFatal catches and kills the task
    val big = new Array[Byte](Multimodal.MaxAudioBytes + 1)
    val t0 = System.nanoTime()
    assert(Multimodal.decodeAudio(big).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 2.0,
      "over-cap refusal must be O(1), not a parse attempt")
    // and a normal WAV still decodes (the cap only bounds, never breaks)
    val bb = java.nio.ByteBuffer.allocate(44 + 200)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 200)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(200)
    (0 until 100).foreach(_ => bb.putShort(1000))
    assert(Multimodal.decodeAudio(bb.array()).isDefined)
  }

  test("MediaFetchSim: real decodable JPEG, deterministic, size-segment parsed with a hash fallback") {
    import graft.fetch.MediaFetchSim
    val seed = 42L
    val ref = "https://img.cdn.example.com/remote/230x230/image/i123.jpg"
    val a = MediaFetchSim.fetchBytes(ref, seed)
    // determinism: byte-identical across calls (downstream features are
    // pure in the ref, the property the engine's resume equality rides on)
    assert(java.util.Arrays.equals(a, MediaFetchSim.fetchBytes(ref, seed)))
    // a REAL container: the production decode path accepts it, and the
    // served dims are the requested dims folded into [8, 48]
    val (w, h, emb) = Multimodal.decodeImage(a).get
    assert(w == 8 + 230 % 41 && h == 8 + 230 % 41)
    assert(emb.length == Multimodal.EMB_DIMS && emb.forall(v => v >= 0f && v <= 1f))
    // different refs serve different pixels (the gradient varies), and a
    // different seed is a different web
    val b = MediaFetchSim.fetchBytes(
      "https://img.cdn.example.com/remote/230x230/image/i124.jpg", seed)
    assert(!java.util.Arrays.equals(a, b), "distinct refs served identical bytes")
    assert(!java.util.Arrays.equals(a, MediaFetchSim.fetchBytes(ref, seed + 1)))
    // refs without a parseable size segment still serve deterministically
    // (hash-derived request dims) and still decode
    val c = MediaFetchSim.fetchBytes("https://other.example.com/x.jpg", seed)
    assert(Multimodal.decodeImage(c).isDefined)
    assert(java.util.Arrays.equals(c,
      MediaFetchSim.fetchBytes("https://other.example.com/x.jpg", seed)))
  }
}
