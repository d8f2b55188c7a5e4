package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract batch
  * plumbing a training-data pipeline needs.
  *
  * Spark-side design (all real and tested): binary payloads travel as
  * `BinaryType` columns; cheap metadata (byte length, content hash,
  * magic-byte sniff) is pure codegen'd expressions; expensive decode /
  * feature extraction runs as a `mapPartitions` batch stage so the
  * decoder amortizes codec init per partition — the Scala analog of
  * `mapInPandas` batch shape. The decode kernel is REAL for images (JDK
  * `javax.imageio`: PNG/JPEG/GIF/BMP dimensions, channels, luminance
  * histogram — no external codec needed); audio/video payloads, whose
  * codecs the JDK genuinely lacks, fall back to a documented
  * deterministic fingerprint so the batch shape is uniform across types.
  */
object Multimodal {

  /** Canonical media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("sha", StringType))))))

  /** Wrap any table with a binary column into the media shape —
    * metadata derived with codegen'd expressions only. */
  def toMedia(df: DataFrame, idCol: String, binCol: String,
      mime: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(binCol).cast(BinaryType).as("payload"),
      lit(mime).as("mime"),
      struct(
        octet_length(col(binCol).cast(BinaryType)).cast(LongType)
          .as("n_bytes"),
        sha2(col(binCol).cast(BinaryType), 256).as("sha")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, n_frames: Int,
      width: Int, height: Int, channels: Int, sample_rate: Int,
      feature: Array[Float])

  /** Decode kernel. Image payloads (PNG/JPEG/GIF/BMP) get a REAL decode
    * through the JDK's built-in `javax.imageio`: dimensions, channel
    * count, and a normalized 8-bin luminance histogram as the feature
    * vector. Audio payloads (WAV/AIFF/AU — the containers the JDK's
    * `javax.sound.sampled` genuinely parses) get a REAL decode too:
    * sample rate, channel count, PCM frame count, and a normalized 8-bin
    * amplitude histogram over the decoded samples. Everything else
    * (video codecs the JDK lacks) falls back to a deterministic
    * byte-fingerprint stand-in with width/height/channels/sample_rate = 0,
    * keeping the batch shape identical for every media type. */
  private[ops] def decodeKernel(payload: Array[Byte])
      : (Int, Int, Int, Int, Int, Array[Float]) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img != null) {
      val w = img.getWidth; val h = img.getHeight
      val ch = img.getColorModel.getNumComponents
      val hist = new Array[Float](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(math.min(lum * 8 / 256, 7)) += 1.0f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < 8) { hist(i) /= n; i += 1 }
      (1, w, h, ch, 0, hist)
    } else decodeAudio(payload).getOrElse {
      val nFrames = 1 + (if (payload.isEmpty) 0 else payload.length % 7)
      val feat = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        feat(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (nFrames, 0, 0, 0, 0, feat)
    }
  }

  /** Real audio decode through `javax.sound.sampled` (WAV/AIFF/AU).
    * Reads at most `audioSampleCap` bytes of decoded PCM for the
    * amplitude histogram so one giant payload can't stall a task; the
    * frame count still comes from the container header. None when the
    * payload isn't a recognized audio container. */
  private val audioSampleCap = 1 << 16

  private[ops] def decodeAudio(payload: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Array[Float])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = math.min(ais.getFrameLength, Int.MaxValue.toLong).toInt
        val hist = new Array[Float](8)
        val buf = new Array[Byte](4096)
        var total = 0
        var read = ais.read(buf)
        while (read > 0 && total < audioSampleCap) {
          var i = 0
          while (i < read) { hist((buf(i) & 0xff) >> 5) += 1.0f; i += 1 }
          total += read
          read = ais.read(buf)
        }
        if (total > 0) { var i = 0; while (i < 8) { hist(i) /= total; i += 1 } }
        Some((math.max(frames, 0), 0, 0, fmt.getChannels,
          fmt.getSampleRate.toInt, hist))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batch decode/feature-extract: one kernel init per partition, rows
    * processed in a streaming iterator (constant memory). At scale,
    * repartition upstream by size so partitions stay codec-friendly. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init: keep ImageIO off its disk scratch cache
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val (frames, w, h, ch, rate, feat) = decodeKernel(payload)
          MediaFeatures(id, payload.length.toLong, frames, w, h, ch, rate,
            feat)
        }
      }.toDF()
  }

  final case class MediaResized(
      media_id: Long, decoded: Boolean, width: Int, height: Int,
      payload: Array[Byte])

  /** Real image resize as a batch stage: decode via `javax.imageio`,
    * scale the longest side down to `maxDim` (bilinear, aspect-preserving,
    * never upscales), re-encode as PNG. Non-image payloads pass through
    * untouched with `decoded = false` so a mixed-modality table survives
    * the stage — the standard pre-training image-normalization shape.
    * Same mapPartitions batch contract as [[decodeFeatures]]: one codec
    * init per partition, streaming iterator, constant memory. */
  def resizeImages(spark: SparkSession, media: DataFrame, maxDim: Int)
      : DataFrame = {
    import spark.implicits._
    require(maxDim > 0, s"maxDim must be positive: $maxDim")
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val img = try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          catch { case _: java.io.IOException => null }
          if (img == null) MediaResized(id, decoded = false, 0, 0, payload)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val longest = math.max(w, h)
            if (longest <= maxDim) MediaResized(id, decoded = true, w, h,
              payload)
            else {
              val scale = maxDim.toDouble / longest
              val nw = math.max(1, math.round(w * scale).toInt)
              val nh = math.max(1, math.round(h * scale).toInt)
              val dst = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw, nh, null)
              } finally g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              MediaResized(id, decoded = true, nw, nh, out.toByteArray)
            }
          }
        }
      }.toDF()
  }

  /** Frame sampling: every k-th fixed-width "frame" of a payload's
    * base64 form as a row — the explode-shaped row multiplication of a
    * video sampling stage. Two Spark-4 traps handled here: `base64` is
    * MIME-chunked (inserts `\r\n` every 76 chars — stripped back to the
    * canonical encoding, which is also what DuckDB's `to_base64` emits),
    * and `split` keeps the trailing empty element Java's own
    * `String.split` would strip (dropped, except the idx-0 frame of an
    * empty payload so every media row yields at least one frame). */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(split(
        regexp_replace(base64(col("payload")), "[\\r\\n]", ""),
        "(?<=\\G.{32})")).as(Seq("frame_idx", "frame_b64")))
      .filter(col("frame_idx") % everyK === 0)
      .filter(col("frame_b64") =!= "" || col("frame_idx") === 0)

  /** Oracle-checked metadata query: binary length + hashes over a
    * binary-ified text column (the codegen'd metadata path). */
  val multimodalMeta = GQuery(
    "multimodal_meta",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text").cast(BinaryType)).cast(LongType)
            .as("n_bytes"),
          md5(col("text").cast(BinaryType)).as("content_md5"),
          sha2(col("text").cast(BinaryType), 256).as("content_sha256"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5,
             sha256(text) AS content_sha256
      FROM documents
      ORDER BY doc_id
    """))

  /** Rows-only: the full binary → mapPartitions decode path (the decode
    * kernel has no SQL twin, but the plumbing runs for real — text
    * payloads take the non-image fallback branch). The dumped frame is
    * scalar-only — the float[] feature is projected to a rounded string
    * fingerprint, because the driver's verifier sorts/hashes every output
    * and array cells break that even for rows-only checks. */
  val multimodalDecode = GQuery(
    "multimodal_decode",
    (s, d) => {
      val media = toMedia(Tables.documents(s, d).filter(col("doc_id") < 50),
        "doc_id", "text", "text/plain")
      decodeFeatures(s, media)
        .select(col("media_id"), col("n_bytes"), col("n_frames"),
          col("width"), col("height"), col("channels"), col("sample_rate"),
          array_join(transform(col("feature"),
            x => format_string("%.3f", x.cast(DoubleType))), ",")
            .as("feature_fp"))
        .orderBy("media_id")
    },
    None)

  /** Frame sampling as an oracle-checked query: chunk each payload's
    * base64 form into fixed 32-char "frames", keep every 4th — the
    * explode-shaped row multiplication of a video sampling stage, with
    * the chunking re-derived independently in DuckDB via substring
    * arithmetic (Spark side splits with a \G-anchored regex, so the two
    * chunkers agree only if both cut at exactly 32). */
  val multimodalFrames = GQuery(
    "multimodal_frames",
    (s, d) => {
      val media = toMedia(Tables.documents(s, d).filter(col("doc_id") < 50),
        "doc_id", "text", "text/plain")
      sampleFrames(media, 4)
        .select(col("media_id"), col("frame_idx"), col("frame_b64"))
        .orderBy("media_id", "frame_idx")
    },
    Some("""
      WITH m AS (
        SELECT doc_id, to_base64(encode(text)) AS b64
        FROM documents WHERE doc_id < 50),
      f AS (
        SELECT doc_id AS media_id, b64,
               UNNEST(range(0, GREATEST(1,
                 CAST(CEIL(LENGTH(b64) / 32.0) AS BIGINT)))) AS idx
        FROM m)
      SELECT media_id, CAST(idx AS INT) AS frame_idx,
             SUBSTRING(b64, CAST(idx * 32 + 1 AS INT), 32) AS frame_b64
      FROM f WHERE idx % 4 = 0
      ORDER BY media_id, frame_idx
    """))

  /** Rows-only: the real image-resize batch path. Each doc's text is
    * rendered into a genuine 16x10 PNG (pixels seeded from the text's
    * SHA-256 — deterministic), pushed through [[resizeImages]] (bilinear
    * scale to longest-side 8, PNG re-encode), and the output payload is
    * RE-decoded to prove the resized bytes are a valid image of the
    * claimed dimensions. No SQL twin exists for the AWT kernel; the
    * scalar dump carries only dimensions and the re-decode verdict
    * (encoder byte counts vary by JDK, so payload sizes stay out). */
  val multimodalResize = GQuery(
    "multimodal_resize",
    (s, d) => {
      import s.implicits._
      val rendered = Tables.documents(s, d).filter(col("doc_id") < 50)
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { rows =>
          javax.imageio.ImageIO.setUseCache(false)
          rows.map { case (id, text) =>
            val sha = java.security.MessageDigest.getInstance("SHA-256")
              .digest(Option(text).getOrElse("").getBytes("UTF-8"))
            val img = new java.awt.image.BufferedImage(
              16, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < 10) {
              var x = 0
              while (x < 16) {
                val b = sha((y * 16 + x) % 32) & 0xff
                img.setRGB(x, y, (b << 16) | (b << 8) | b)
                x += 1
              }
              y += 1
            }
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", out)
            (id, out.toByteArray)
          }
        }.toDF("media_id", "payload")
      val resized = resizeImages(s, rendered, maxDim = 8)
      decodeFeatures(s, resized)
        .select(col("media_id"), col("width"), col("height"),
          col("channels"))
        .join(resized.select(col("media_id"),
          col("width").as("claimed_w"), col("height").as("claimed_h"),
          col("decoded")), "media_id")
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("decoded"),
          (col("width") === col("claimed_w") &&
            col("height") === col("claimed_h")).as("redecode_ok"))
        .orderBy("media_id")
    },
    None)

  def all: Seq[GQuery] = Seq(multimodalMeta, multimodalDecode,
    multimodalFrames, multimodalResize)
}
