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

  /** Render a deterministic w×h RGB PNG whose pixels are seeded from
    * the text's SHA-256 — a REAL image with KNOWN dimensions, the
    * fixture half of the anchor+tolerance pattern: the decode queries
    * emit what the JDK codec actually parsed, and the oracle recomputes
    * the expected dims from the id arithmetic alone. */
  private[ops] def renderPng(text: String, w: Int, h: Int): Array[Byte] = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Option(text).getOrElse("").getBytes("UTF-8"))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = sha((y * w + x) % 32) & 0xff
        img.setRGB(x, y, (b << 16) | (b << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Minimal PCM16 little-endian WAV container with exact header
    * fields — a REAL audio payload `javax.sound.sampled` parses, whose
    * sample rate / channel count / frame count are KNOWN by
    * construction (the audio half of the decode fixture). Sample bytes
    * are seeded from the text's SHA-256, deterministic. */
  private[ops] def renderWav(text: String, sampleRate: Int, channels: Int,
      frames: Int): Array[Byte] = {
    val dataSize = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Option(text).getOrElse("").getBytes("UTF-8"))
    var i = 0
    while (i < dataSize) { buf.put(sha(i % 32)); i += 1 }
    buf.array()
  }

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

  /** The full binary → mapPartitions decode path, DRIVER-VERIFIED via
    * the known-fixture anchor pattern: each doc renders into a payload
    * whose decodable properties are KNOWN from the id arithmetic alone —
    * id%3==0 a real PNG ([[renderPng]], dims 8+id%16 × 6+id%10), id%3==1
    * a real WAV ([[renderWav]], rate 8000+100·(id%5), channels 1+id%2,
    * frames 64+id%32), id%3==2 raw UTF-8 text (the documented
    * no-codec fallback: n_frames = 1 + n_bytes%7, dims zero). The query
    * emits exactly what `javax.imageio` / `javax.sound` actually parsed
    * back out of the bytes, and the DuckDB oracle recomputes every
    * column from doc_id + text — a wrong dimension, rate, channel count
    * or frame count from any decode branch hash-mismatches. n_bytes is
    * emitted only for the text rows (PNG/WAV encoder byte counts are
    * JDK-version-dependent; −1 sentinel elsewhere). */
  val multimodalDecode = GQuery(
    "multimodal_decode",
    (s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 50)
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { rows =>
          javax.imageio.ImageIO.setUseCache(false)
          rows.map { case (id, text) =>
            val payload = (id % 3) match {
              case 0 => renderPng(text, (8 + id % 16).toInt,
                (6 + id % 10).toInt)
              case 1 => renderWav(text, (8000 + 100 * (id % 5)).toInt,
                (1 + id % 2).toInt, (64 + id % 32).toInt)
              case _ => Option(text).getOrElse("").getBytes("UTF-8")
            }
            (id, payload)
          }
        }.toDF("media_id", "payload")
      decodeFeatures(s, media)
        .select(col("media_id"),
          col("n_frames").cast(LongType).as("n_frames"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("channels").cast(LongType).as("channels"),
          col("sample_rate").cast(LongType).as("sample_rate"),
          when(col("media_id") % 3 === 2, col("n_bytes"))
            .otherwise(lit(-1L)).as("n_bytes_text"))
        .orderBy("media_id")
    },
    Some("""
      SELECT doc_id AS media_id,
             CAST(CASE doc_id % 3
               WHEN 0 THEN 1
               WHEN 1 THEN 64 + doc_id % 32
               ELSE 1 + (octet_length(encode(COALESCE(text, ''))) % 7)
             END AS BIGINT) AS n_frames,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 16 ELSE 0 END AS BIGINT) AS width,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 6 + doc_id % 10 ELSE 0 END AS BIGINT) AS height,
             CAST(CASE doc_id % 3
               WHEN 0 THEN 3
               WHEN 1 THEN 1 + doc_id % 2
               ELSE 0
             END AS BIGINT) AS channels,
             CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + 100 * (doc_id % 5) ELSE 0 END AS BIGINT) AS sample_rate,
             CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(COALESCE(text, ''))) ELSE -1 END AS BIGINT) AS n_bytes_text
      FROM documents WHERE doc_id < 50
      ORDER BY media_id
    """))

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

  /** The real image-resize batch path, DRIVER-VERIFIED via the
    * known-fixture anchor pattern: even ids render a genuine 16×10 PNG
    * ([[renderPng]]) that [[resizeImages]] must bilinear-scale to
    * exactly 8×5 and PNG re-encode; odd ids render 6×4 — already within
    * maxDim, so the pass-through branch must keep the original bytes
    * and dims. The emitted dims come from RE-decoding the output
    * payload (proving the resized bytes are a valid image of the
    * claimed size), `redecode_ok` cross-checks decode against claim,
    * and the DuckDB oracle recomputes every column from doc_id
    * arithmetic — a wrong scale factor, a broken re-encode, or an
    * upscaled small image all hash-mismatch. Encoder byte counts vary
    * by JDK, so payload sizes stay out of the dump. */
  val multimodalResize = GQuery(
    "multimodal_resize",
    (s, d) => {
      import s.implicits._
      val rendered = Tables.documents(s, d).filter(col("doc_id") < 50)
        .select("doc_id", "text").as[(Long, String)]
        .mapPartitions { rows =>
          javax.imageio.ImageIO.setUseCache(false)
          rows.map { case (id, text) =>
            val (w, h) = if (id % 2 == 0) (16, 10) else (6, 4)
            (id, renderPng(text, w, h))
          }
        }.toDF("media_id", "payload")
      val resized = resizeImages(s, rendered, maxDim = 8)
      decodeFeatures(s, resized)
        .select(col("media_id"),
          col("width").cast(LongType).as("width"),
          col("height").cast(LongType).as("height"),
          col("channels").cast(LongType).as("channels"))
        .join(resized.select(col("media_id"),
          col("width").as("claimed_w"), col("height").as("claimed_h"),
          col("decoded")), "media_id")
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("decoded"),
          (col("width") === col("claimed_w") &&
            col("height") === col("claimed_h")).as("redecode_ok"))
        .orderBy("media_id")
    },
    Some("""
      SELECT doc_id AS media_id,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 6 END AS BIGINT) AS width,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 4 END AS BIGINT) AS height,
             CAST(3 AS BIGINT) AS channels,
             TRUE AS decoded,
             TRUE AS redecode_ok
      FROM documents WHERE doc_id < 50
      ORDER BY media_id
    """))

  def all: Seq[GQuery] = Seq(multimodalMeta, multimodalDecode,
    multimodalFrames, multimodalResize)
}
