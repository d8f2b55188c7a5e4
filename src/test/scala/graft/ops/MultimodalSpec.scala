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

  /** Encode `n` frames of 16-bit mono PCM at the given rate through the
    * JDK's own WAV writer — a genuine RIFF/WAVE byte stream in memory. */
  private def wavBytes(rate: Float, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { // deterministic ramp
      val v = (i * 257 % 65536 - 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeFeatures performs a real WAV decode on audio payloads") {
    import spark.implicits._
    val media = Seq(
      (20L, wavBytes(8000f, 1000)),
      (21L, wavBytes(44100f, 441)),
      (22L, "definitely not audio".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeFeatures(spark, media)
      .orderBy("media_id").collect()
    def f(r: org.apache.spark.sql.Row, c: String) = r.getInt(r.fieldIndex(c))
    // real container metadata: sample rate, channel count, frame count
    assert(f(out(0), "sample_rate") === 8000)
    assert(f(out(0), "channels") === 1)
    assert(f(out(0), "n_frames") === 1000)
    assert(f(out(1), "sample_rate") === 44100)
    assert(f(out(1), "n_frames") === 441)
    // audio is dimensionless; non-audio text stays on the fallback branch
    assert(f(out(0), "width") === 0 && f(out(0), "height") === 0)
    assert(f(out(2), "sample_rate") === 0)
    // amplitude histogram is normalized over the decoded PCM bytes
    val fIdx = out.head.fieldIndex("feature")
    val hist = out(0).getSeq[Float](fIdx)
    assert(math.abs(hist.sum - 1.0f) < 1e-5)
  }

  test("resizeImages scales the longest side down, never up, and " +
    "passes non-images through") {
    import spark.implicits._
    val media = Seq(
      (30L, imageBytes(16, 9, 0x808080, "png")),  // downscale 16x9 -> 8x5
      (31L, imageBytes(4, 4, 0x112233, "png")),   // already small: kept
      (32L, "not an image".getBytes("UTF-8")))    // passthrough
      .toDF("media_id", "payload")
    val out = Multimodal.resizeImages(spark, media, maxDim = 8)
      .orderBy("media_id").collect()
    def f(r: org.apache.spark.sql.Row, c: String) = r.getInt(r.fieldIndex(c))
    assert((f(out(0), "width"), f(out(0), "height")) === (8, 5))
    assert((f(out(1), "width"), f(out(1), "height")) === (4, 4))
    assert(out(0).getBoolean(out(0).fieldIndex("decoded")))
    assert(!out(2).getBoolean(out(2).fieldIndex("decoded")))
    val pIdx = out.head.fieldIndex("payload")
    // the un-resized image and the non-image keep their exact bytes
    assert(out(1).getAs[Array[Byte]](pIdx).toSeq ===
      media.filter(col("media_id") === 31L).head().getAs[Array[Byte]](1).toSeq)
    assert(out(2).getAs[Array[Byte]](pIdx).toSeq ===
      "not an image".getBytes("UTF-8").toSeq)
    // the resized payload is a VALID image of the claimed dimensions
    val redecoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]](pIdx)))
    assert(redecoded.getWidth === 8 && redecoded.getHeight === 5)
  }

  test("sampleFrames chunks across the 76-char MIME seam and strips " +
    "the trailing empty") {
    import spark.implicits._
    def mediaOf(id: Long, text: String) = Multimodal.toMedia(
      Seq((id, text)).toDF("doc_id", "text"), "doc_id", "text", "text/plain")
    // 100 bytes → canonical b64 is 136 chars (past Spark base64's 76-char
    // MIME wrap) → 4 full 32-char chunks + one 8-char remainder
    val frames = Multimodal.sampleFrames(mediaOf(1L, "x" * 100), 1)
      .orderBy("frame_idx").collect()
    assert(frames.length === 5)
    assert(frames.forall(!_.getString(2).contains("\r")))
    assert(frames.take(4).forall(_.getString(2).length === 32))
    assert(frames.last.getString(2).length === 8)
    // the frames reassemble to a valid encoding of the original payload
    val joined = frames.map(_.getString(2)).mkString
    assert(new String(java.util.Base64.getDecoder.decode(joined),
      "UTF-8") === "x" * 100)
    // 24-byte payload → b64 exactly 32 chars → one chunk, no trailing ""
    val exact = Multimodal.sampleFrames(mediaOf(2L, "y" * 24), 1).collect()
    assert(exact.length === 1 && exact.head.getString(2).length === 32)
    // empty payload still yields its idx-0 frame
    val empty = Multimodal.sampleFrames(mediaOf(3L, ""), 1).collect()
    assert(empty.length === 1 && empty.head.getString(2) === "")
  }

  test("sampleFrames emits every k-th chunk with positions") {
    val media = Multimodal.toMedia(docs, "doc_id", "text", "text/plain")
    val frames = Multimodal.sampleFrames(media, 2)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "frame_b64"))
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() === 0)
    assert(frames.count() > 0)
  }
}
