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
    // deterministic fallback: same input → same feature vector
    val again = Multimodal.decodeFeatures(spark, media)
      .orderBy("media_id").collect()
    val fIdx = feats.head.fieldIndex("feature")
    assert(feats.map(_.getSeq[Float](fIdx)).toSeq
      === again.map(_.getSeq[Float](fIdx)).toSeq)
    // text payloads are not images → fallback branch, zero dimensions
    assert(feats.forall(r => r.getInt(r.fieldIndex("width")) === 0))
    // empty payload decodes to 1 frame, zero feature
    val empty = feats(1)
    assert(empty.getInt(empty.fieldIndex("n_frames")) === 1)
  }

  /** Encode a W×H image with the given RGB fill through the JDK's
    * ImageIO writer — a genuine PNG/JPEG byte stream, built in memory. */
  private def imageBytes(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("decodeFeatures performs a real imageio decode on image payloads") {
    import spark.implicits._
    val imgs = Seq(
      (10L, imageBytes(16, 9, 0xffffff, "png")),   // white PNG
      (11L, imageBytes(8, 8, 0x000000, "jpg")),    // black JPEG
      (12L, "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val media = imgs.select(col("media_id"), col("payload"),
      lit("image/mixed").as("mime"),
      struct(octet_length(col("payload")).cast(LongType).as("n_bytes"),
        sha2(col("payload"), 256).as("sha")).as("meta"))
    val out = Multimodal.decodeFeatures(spark, media)
      .orderBy("media_id").collect()
    def f(r: org.apache.spark.sql.Row, c: String) = r.getInt(r.fieldIndex(c))
    // real decoded dimensions + channel counts
    assert((f(out(0), "width"), f(out(0), "height")) === (16, 9))
    assert((f(out(1), "width"), f(out(1), "height")) === (8, 8))
    assert(f(out(0), "channels") === 3)
    // luminance histograms: all-white mass in the top bin, all-black in
    // the bottom; each histogram is normalized (sums to 1)
    val fIdx = out.head.fieldIndex("feature")
    val white = out(0).getSeq[Float](fIdx)
    val black = out(1).getSeq[Float](fIdx)
    assert(math.abs(white(7) - 1.0f) < 1e-6 && math.abs(white.sum - 1.0f) < 1e-6)
    assert(math.abs(black(0) - 1.0f) < 1e-6 && math.abs(black.sum - 1.0f) < 1e-6)
    // the non-image row takes the fallback branch, not a crash
    assert(f(out(2), "width") === 0 && out(2).getSeq[Float](fIdx).length === 8)
  }

  test("sampleFrames emits every k-th chunk with positions") {
    val media = Multimodal.toMedia(docs, "doc_id", "text", "text/plain")
    val frames = Multimodal.sampleFrames(media, 2)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame_b64"))
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(frames.count() > 0)
  }
}
