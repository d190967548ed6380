package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs batched inside mapPartitions (the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline: partition-local model init,
  * row batches in, feature rows out).
  *
  * The actual codec call is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — schema, batch shape, partition-local
  * "model" lifecycle, the typed output contract — is real and tested
  * (MultimodalSpec).
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      embedding: Array[Float])

  /** STUB for the real decoder (e.g. JPEG decode + resize + CNN features).
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
        val (w, h, f, emb) = decodeStub(r.payload, r.kind)
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
