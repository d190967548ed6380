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
      assert(emb.length == 16)
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
}
