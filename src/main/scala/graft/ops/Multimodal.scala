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
      width: Int, height: Int, channels: Int, feature: Array[Float])

  /** Decode kernel. Image payloads (PNG/JPEG/GIF/BMP) get a REAL decode
    * through the JDK's built-in `javax.imageio` — no external codec
    * needed: dimensions, channel count, and a normalized 8-bin luminance
    * histogram as the feature vector. Non-image payloads (audio/video —
    * codecs the JDK genuinely lacks) fall back to a deterministic
    * byte-fingerprint stand-in with width/height/channels = 0, keeping the
    * batch shape identical for every media type. */
  private[ops] def decodeKernel(payload: Array[Byte])
      : (Int, Int, Int, Int, Array[Float]) = {
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
      (1, w, h, ch, hist)
    } else {
      val nFrames = 1 + (if (payload.isEmpty) 0 else payload.length % 7)
      val feat = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        feat(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (nFrames, 0, 0, 0, feat)
    }
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
          val (frames, w, h, ch, feat) = decodeKernel(payload)
          MediaFeatures(id, payload.length.toLong, frames, w, h, ch, feat)
        }
      }.toDF()
  }

  /** Frame sampling stub: every k-th "frame" of a payload as a row —
    * the explode-shaped UDTF surface of video pipelines. */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(split(base64(col("payload")), "(?<=\\G.{32})"))
        .as(Seq("frame_idx", "frame_b64")))
      .filter(col("frame_idx") % everyK === 0)

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
          col("width"), col("height"), col("channels"),
          array_join(transform(col("feature"),
            x => format_string("%.3f", x.cast(DoubleType))), ",")
            .as("feature_fp"))
        .orderBy("media_id")
    },
    None)

  def all: Seq[GQuery] = Seq(multimodalMeta, multimodalDecode)
}
