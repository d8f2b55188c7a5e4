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
  * feature extraction runs as a `mapPartitions` batch stage so a real
  * decoder would amortize model/codec init per partition — the Scala
  * analog of `mapInPandas` batch shape. The decode kernel itself is a
  * clearly-marked deterministic STUB (this container ships no image/audio
  * codecs); swap `decodeKernel` for a real decoder without touching the
  * plumbing.
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
      media_id: Long, n_bytes: Long, n_frames: Int, feature: Array[Float])

  /** STUB decode kernel — deterministic fake standing in for a real
    * image/audio decoder (none available in this container). Produces a
    * fixed-dim "feature" from payload bytes and a fake frame count.
    * Replace with the real codec; the batch shape stays. */
  private[ops] def decodeKernel(payload: Array[Byte]): (Int, Array[Float]) = {
    val nFrames = 1 + (if (payload.isEmpty) 0 else payload.length % 7)
    val feat = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      feat(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (nFrames, feat)
  }

  /** Batch decode/feature-extract: one kernel init per partition, rows
    * processed in a streaming iterator (constant memory). At scale,
    * repartition upstream by size so partitions stay codec-friendly. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would happen here (codec handle, model, …)
        rows.map { case (id, payload) =>
          val (frames, feat) = decodeKernel(payload)
          MediaFeatures(id, payload.length.toLong, frames, feat)
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

  /** Rows-only: the full binary → mapPartitions decode path (stub kernel
    * has no SQL twin, but the plumbing runs for real). The dumped frame is
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
          array_join(transform(col("feature"),
            x => format_number(x.cast(DoubleType), 3)), ",")
            .as("feature_fp"))
        .orderBy("media_id")
    },
    None)

  def all: Seq[GQuery] = Seq(multimodalMeta, multimodalDecode)
}
