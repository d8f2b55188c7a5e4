package graft.sources

import graft.SparkTestBase
import graft.ops.{Epoch, EpochTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The epoch table change feed: `readStream.table` emits committed
  * delta versions as micro-batches, exactly-once off the checkpoint,
  * append-only violations fail loudly, takedowns never retract. */
class EpochTableStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def mkTyped(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i", i * 10L)).toDF("event_id", "etype", "uid")

  private val root = s"${graft.GraftSession.scratchDir}/sqlstream"

  private def registered(): Unit =
    EpochTableCatalog.register(spark, "gstr", root)

  private def startMemory(df: org.apache.spark.sql.DataFrame,
      name: String, checkpoint: Option[String] = None): StreamingQuery = {
    val w = df.writeStream.format("memory").queryName(name)
    checkpoint.map(w.option("checkpointLocation", _)).getOrElse(w)
      .start()
  }

  test("a stream started at head emits only subsequently committed " +
      "delta versions, batch by batch; a tombstone epoch emits nothing") {
    registered()
    val path = s"$root/feed"
    EpochTable.refresh(spark, path, mkTyped(1L to 20L), version = 0L)
    val q = startMemory(
      spark.readStream.table("gstr.feed").select("event_id", "uid"),
      "feed_sink")
    try {
      q.processAllAvailable()
      assert(spark.table("feed_sink").count() === 0L)
      EpochTable.refreshDelta(spark, path, mkTyped(21L to 30L),
        version = 1L)
      q.processAllAvailable()
      assert(spark.table("feed_sink").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === (21L to 30L))
      // a takedown epoch adds no dirs: nothing emitted, nothing retracted
      EpochTable.delete(spark, Seq(21L, 5L).toDF("event_id"), path,
        batchId = 1L)
      EpochTable.refreshDelta(spark, path, mkTyped(31L to 33L),
        version = 2L)
      q.processAllAvailable()
      assert(spark.table("feed_sink").count() === 13L)
    } finally q.stop()
  }

  test("startingVersion replays from a retained RawDataVersion id; " +
      "the checkpoint makes restart exactly-once") {
    registered()
    val path = s"$root/resume"
    val ckpt = s"$root/resume_ckpt"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(11L to 15L), version = 1L)
    EpochTable.refreshDelta(spark, path, mkTyped(16L to 18L), version = 2L)
    // a fault-tolerant sink (parquet), so the restart exercises the
    // SOURCE's checkpointed offsets (memory sinks refuse recovery)
    val out = s"$root/resume_out"
    def run(): Unit = {
      val q = spark.readStream.option("startingVersion", "1")
        .table("gstr.resume")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // both retained delta versions stream; the snapshot does not
    assert(spark.read.parquet(out).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq === (11L to 18L))
    // restart on the SAME checkpoint: nothing re-emitted, new deltas flow
    EpochTable.refreshDelta(spark, path, mkTyped(19L to 20L), version = 3L)
    run()
    assert(spark.read.parquet(out).select("event_id").collect()
      .map(_.getLong(0)).sorted.toSeq === (11L to 20L))
  }

  test("startingVersion at the FIRST version streams the initial " +
      "snapshot itself (epoch 0's predecessor is the empty layout)") {
    registered()
    val path = s"$root/genesis"
    EpochTable.refresh(spark, path, mkTyped(1L to 7L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(8L to 9L), version = 1L)
    val q = startMemory(
      spark.readStream.option("startingVersion", "0")
        .table("gstr.genesis"),
      "genesis_sink")
    try {
      q.processAllAvailable()
      assert(spark.table("genesis_sink").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === (1L to 9L))
    } finally q.stop()
  }

  test("non-append epochs: a FOLD is skipped (content-preserving " +
      "marker) and the stream survives it; a full refresh still " +
      "fails loudly; a merge fails the plain feed naming the " +
      "$changes alternative") {
    registered()
    val path = s"$root/ao"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    val q = startMemory(spark.readStream.table("gstr.ao"), "ao_sink")
    try {
      q.processAllAvailable()
      EpochTable.refreshDelta(spark, path, mkTyped(11L to 14L),
        version = 1L)
      q.processAllAvailable()
      assert(spark.table("ao_sink").count() === 4L)
      // the fold emits nothing and breaks nothing — deltas keep
      // flowing across it
      EpochTable.compact(spark, path)
      q.processAllAvailable()
      assert(spark.table("ao_sink").count() === 4L)
      EpochTable.refreshDelta(spark, path, mkTyped(15L to 16L),
        version = 2L)
      q.processAllAvailable()
      assert(spark.table("ao_sink").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === (11L to 16L))
      // a FULL REFRESH rewrites history — that still fails
      EpochTable.refresh(spark, path, mkTyped(1L to 3L), version = 9L)
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("rewrote data directories") ||
        Option(e.getCause).exists(
          _.getMessage.contains("rewrote data directories")),
        s"wrong failure: ${e.getMessage}")
    } finally q.stop()
    val q2 = startMemory(spark.readStream.table("gstr.ao"), "ao_sink2")
    try {
      q2.processAllAvailable()
      EpochTable.merge(spark, path,
        Seq((1L, "mod", 0L)).toDF("event_id", "etype", "uid"),
        version = 10L, keys = Seq("event_id"))
      val e = intercept[Exception] { q2.processAllAvailable() }
      assert(e.getMessage.contains("committed a keyed merge") ||
        Option(e.getCause).exists(
          _.getMessage.contains("committed a keyed merge")),
        s"wrong failure: ${e.getMessage}")
    } finally q2.stop()
  }

  test("$changes: merges stream as typed upserts, deltas as inserts, " +
      "takedowns as deduped delete keys (NULL-padded), folds are " +
      "skipped, and a checkpoint restart across a merge version is " +
      "exactly-once") {
    registered()
    val path = s"$root/cdc"
    val ckpt = s"$root/cdc_ckpt"
    val out = s"$root/cdc_out"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.merge(spark, path,
      mkTyped(Seq(1L, 2L, 11L)).withColumn("etype", lit("up")),
      version = 1L, keys = Seq("event_id"))
    def run(): Unit = {
      val q = spark.readStream.option("startingVersion", "1")
        .table("gstr.`cdc$changes`")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val r1 = spark.read.parquet(out)
    assert(r1.count() === 3L)
    assert(r1.where(col("_op") === "upsert").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 11L))
    assert(r1.where(col("event_id") === 2L).head()
      .getAs[String]("etype") === "up")
    // fold (skipped), a delta, and a TWO-STEP takedown — the second
    // batch re-dooms 2 and adds 12; only 12 is a fresh change
    EpochTable.compact(spark, path)
    EpochTable.refreshDelta(spark, path, mkTyped(12L to 13L),
      version = 2L)
    EpochTable.delete(spark, Seq(2L).toDF("event_id"), path,
      batchId = 1L)
    EpochTable.delete(spark, Seq(2L, 12L).toDF("event_id"), path,
      batchId = 2L)
    run()
    val r2 = spark.read.parquet(out)
    assert(r2.count() === 7L, r2.orderBy("_epoch", "event_id")
      .collect().mkString("\n"))
    assert(r2.where(col("_op") === "insert").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(12L, 13L))
    val dels = r2.where(col("_op") === "delete")
    assert(dels.select("event_id").collect().map(_.getLong(0))
      .sorted.toSeq === Seq(2L, 12L))
    // non-key columns NULL-padded, epochs distinct per takedown
    assert(dels.where(col("etype").isNull && col("uid").isNull)
      .count() === 2L)
    assert(dels.select("_epoch").distinct().count() === 2L)
    // a full refresh rewrites history — the change feed fails loudly
    EpochTable.refresh(spark, path, mkTyped(1L to 5L), version = 9L)
    val e = intercept[Exception] { run() }
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(deepMsg(e).contains("no change log"), deepMsg(e))
  }

  test("live producer → live consumer: a tableIngestEpochStream " +
      "writer and a readStream.table feed run against the same layout " +
      "— every ingested row arrives downstream exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    registered()
    val path = s"$root/livepipe"
    EpochTable.refresh(spark, path, mkTyped(Seq.empty[Long]),
      version = -1L)
    val feed = startMemory(spark.readStream.table("gstr.livepipe"),
      "livepipe_sink")
    val src = MemoryStream[(Long, String, Long)]
    val writer = graft.streaming.StreamRunner.tableIngestEpochStream(
      path, src.toDF().toDF("event_id", "etype", "uid"))
    try {
      src.addData((1L, "a", 10L), (2L, "b", 20L))
      writer.processAllAvailable()
      feed.processAllAvailable()
      assert(spark.table("livepipe_sink").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
      src.addData((3L, "c", 30L))
      writer.processAllAvailable()
      feed.processAllAvailable()
      assert(spark.table("livepipe_sink").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally { writer.stop(); feed.stop() }
  }

  test("a stream that fell behind the retention horizon fails naming " +
      "the pruned epoch; a startingVersion older than retention fails") {
    registered()
    val path = s"$root/horizon"
    EpochTable.refresh(spark, path, mkTyped(1L to 5L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(6L to 8L), version = 1L)
    EpochTable.refreshDelta(spark, path, mkTyped(9L to 10L), version = 2L)
    Epoch.prune(spark, path, keep = 1)
    val e = intercept[Exception] {
      val q = startMemory(
        spark.readStream.option("startingVersion", "0")
          .table("gstr.horizon"),
        "horizon_sink")
      try q.processAllAvailable() finally q.stop()
    }
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(deepMsg(e).contains("not a retained version") ||
      deepMsg(e).contains("retention horizon"), deepMsg(e))
  }
}
