package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs batched inside mapPartitions (the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline: partition-local model init,
  * row batches in, feature rows out).
  *
  * The metadata path is REAL: `parseImageHeader` reads width/height out of
  * actual JPEG (SOF frame header) and PNG (IHDR chunk) container bytes with
  * no codec library — pure header arithmetic. Only the pixel-decode /
  * feature-embedding step is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * bytes. Everything else — schema, batch shape, partition-local "model"
  * lifecycle, the typed output contract — is real and tested
  * (MultimodalSpec).
  */
object Multimodal {

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

  /** STUB for the pixel decoder + feature embedder (e.g. JPEG entropy
    * decode + resize + CNN features) — the only remaining stub: real
    * container METADATA comes from parseImageHeader above. Deterministic
    * in the payload bytes; replace with a real codec where the libraries
    * exist. Marked intentionally — do not "fix".
    */
  def decodeStub(payload: Array[Byte], kind: String): (Int, Int, Int, Array[Float]) = {
    var h = 0xcafef00dL
    var i = 0
    while (i < payload.length) { h = graft.gen.SimWeb.splitmix(h ^ (payload(i) & 0xffL)); i += 1 }
    val w = 64 + ((h & Long.MaxValue) % 960).toInt
    val ht = 64 + ((graft.gen.SimWeb.splitmix(h) & Long.MaxValue) % 960).toInt
    val frames = if (kind == "video") 1 + ((h & Long.MaxValue) % 30).toInt else 1
    val emb = new Array[Float](16)
    var j = 0
    var hh = h
    while (j < 16) {
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
      // partition-local heavyweight init would go here (decoder contexts,
      // model weights); amortized over the whole partition like the
      // reference's per-process browser (SURVEY R3)
      val decoderReady = true
      require(decoderReady)
      rows.map { r =>
        val (sw, sh, f, emb) = decodeStub(r.payload, r.kind)
        // real container headers win for image rows; other kinds keep the
        // stub dimensions — an audio/video payload can legitimately START
        // with JPEG/PNG magic (embedded cover art), and parsing that would
        // silently assign the artwork's dimensions to the track
        val (w, h) = (if (r.kind == "image") parseImageHeader(r.payload)
          else None)
          .map { case (_, pw, ph) => (pw, ph) }
          .getOrElse((sw, sh))
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
