package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Exactly-once pins for the composed incremental refresh
  * (`StreamRunner.incrRefreshStream` — the streaming body of the
  * `incr_pipeline` registry query): redelivered history rows are
  * bloom-dropped, a restarted query does not double-count committed
  * batches, a REPLAYED batch id overwrites its own partition instead of
  * appending a second copy, and a dirty batch surfaces gate_ok = false
  * on its partials instead of silently merging. */
class IncrPipelineSpec extends SparkTestBase {
  import StreamingSpec.Ev

  private def ev(id: Long, typ: String, value: Double): Ev = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Ev(id, new Timestamp(base + id * 1000L), id % 5L, typ, value)
  }

  // history = ids 0..49; the redelivery fixture re-sends a few of them
  private lazy val history: Seq[Ev] =
    (0L until 50L).map(i => ev(i, if (i % 2 == 0) "click" else "view", 1.0))

  private def historyDf = {
    import spark.implicits._
    history.toDF()
  }

  private def bloomOf(df: DataFrame): Array[Byte] =
    graft.functions.BloomProbe.serialize(
      df.select(xxhash64(col("event_id")).as("h"))
        .stat.bloomFilter("h", math.max(df.count(), 1L), 0.01))

  private val partial: DataFrame => DataFrame = df =>
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(14,2)"))
          .cast("decimal(38,2)").as("sum_dec"))

  private val gate: DataFrame => DataFrame = df =>
    df.agg(sum(when(col("value") < 0, 1).otherwise(0)).as("m"))
      .select(lit("value_nonneg").as("constraint"),
        (coalesce(col("m"), lit(0L)) === 0).as("ok"))

  private def mergedState(stateDir: String): Map[String, (Long, Double)] =
    spark.read.parquet(stateDir)
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).cast("double").as("total"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("restarted stream: redeliveries dropped, committed batches not recounted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-incr-state").toString
    val ckpt = Files.createTempDirectory("graft-incr-ckpt").toString
    val bloom = bloomOf(historyDf)
    val hk = historyDf.select(col("event_id"))

    def start(source: MemoryStream[Ev]) =
      StreamRunner.incrRefreshStream(source.toDF(), bloom, hk,
        col("event_id"), partial, gate, stateDir, ckpt)

    // run 1: 20 fresh clicks + 3 redelivered history rows
    val batch1 = (100L until 120L).map(ev(_, "click", 2.0)) ++
      Seq(history(0), history(2), history(4))
    val s1 = MemoryStream[Ev]
    val q1 = start(s1)
    s1.addData(batch1: _*)
    q1.processAllAvailable()
    q1.stop()
    assert(mergedState(stateDir) === Map("click" -> (20L, 40.0)))

    // run 2: SAME checkpoint, source re-seeded with run 1's data (the
    // checkpoint's offset log must skip it) plus fresh views and two
    // more redeliveries
    val batch2 = (120L until 135L).map(ev(_, "view", 3.0)) ++
      Seq(history(1), history(3))
    val s2 = MemoryStream[Ev]
    s2.addData(batch1: _*)
    val q2 = start(s2)
    q2.processAllAvailable()
    s2.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()

    // every fresh row counted exactly once; no history id ever merged
    assert(mergedState(stateDir) ===
      Map("click" -> (20L, 40.0), "view" -> (15L, 45.0)))
  }

  test("replayed batch id overwrites its own partition (idempotent re-execution)") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-incr-replay").toString
    val bloom = bloomOf(historyDf)
    val hk = historyDf.select(col("event_id"))
    def run(rows: Seq[Ev], id: Long): Unit =
      StreamRunner.refreshBatch(rows.toDF(), id, bloom, hk,
        col("event_id"), partial, gate, stateDir)

    val b0 = (200L until 210L).map(ev(_, "click", 1.0))
    val b1 = (210L until 215L).map(ev(_, "view", 2.0))
    run(b0, 0L)
    run(b1, 1L)
    // crash-replay: batch 0 re-executes with the same id and rows —
    // totals must NOT change (partition overwritten, not appended)
    run(b0, 0L)
    assert(mergedState(stateDir) ===
      Map("click" -> (10L, 10.0), "view" -> (5L, 10.0)))
  }

  test("a dirty batch publishes gate_ok = false instead of silently merging") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-incr-gate").toString
    val bloom = bloomOf(historyDf)
    val hk = historyDf.select(col("event_id"))
    StreamRunner.refreshBatch(
      Seq(ev(300L, "click", 1.0)).toDF(), 0L, bloom, hk,
      col("event_id"), partial, gate, stateDir)
    StreamRunner.refreshBatch(
      Seq(ev(301L, "click", -5.0)).toDF(), 1L, bloom, hk,
      col("event_id"), partial, gate, stateDir)
    val flags = spark.read.parquet(stateDir)
      .select(col("batch_id").cast("long"), col("gate_ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(0L -> true, 1L -> false))
  }
}
