package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exercises the multimodal plumbing end-to-end on real binary columns:
  * schema shape, metadata correctness, the mapPartitions decode batch
  * path, and frame sampling. */
class MultimodalSpec extends SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, ""), (3L, "binary payload data here"))
      .toDF("doc_id", "text")
  }

  test("toMedia produces the canonical media schema with real metadata") {
    val media = Multimodal.toMedia(docs, "doc_id", "text", "text/plain")
    // compare names+types; lit()/struct() columns are legitimately
    // non-nullable while the declared schema stays permissive
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = media.filter(col("media_id") === 1).select("meta.n_bytes").head()
    assert(r.getLong(0) === 11L) // "hello world"
  }

  test("decodeFeatures runs the batch kernel over every row") {
    val media = Multimodal.toMedia(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.decodeFeatures(spark, media)
      .orderBy("media_id").collect()
    assert(feats.length === 3)
    assert(feats.map(_.getLong(feats.head.fieldIndex("n_bytes"))).toSeq
      === Seq(11L, 0L, 24L))
    // deterministic stub: same input → same feature vector
    val again = Multimodal.decodeFeatures(spark, media)
      .orderBy("media_id").collect()
    assert(feats.map(_.getSeq[Float](3)).toSeq
      === again.map(_.getSeq[Float](3)).toSeq)
    // empty payload decodes to 1 frame, zero feature
    val empty = feats(1)
    assert(empty.getInt(empty.fieldIndex("n_frames")) === 1)
  }

  test("sampleFrames emits every k-th chunk with positions") {
    val media = Multimodal.toMedia(docs, "doc_id", "text", "text/plain")
    val frames = Multimodal.sampleFrames(media, 2)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame_b64"))
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(frames.count() > 0)
  }
}
