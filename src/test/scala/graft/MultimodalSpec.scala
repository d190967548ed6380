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

  test("video rows get multi-frame counts, images single") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
      .collect()
    assert(feats.filter(_.kind != "video").forall(_.n_frames == 1))
    assert(feats.exists(f => f.kind == "video" && f.n_frames > 1))
  }
}
