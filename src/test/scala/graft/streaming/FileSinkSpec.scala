package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** The production streaming sink path: watermarked tumbling aggregation →
  * APPEND-mode parquet file sink with a checkpoint. Append mode only
  * emits a window once the watermark passes its end (finalized — it can
  * never change), and the checkpoint + file-sink log give exactly-once
  * output across a query RESTART: the second query resumes from the
  * checkpoint and must not re-emit windows the first query already
  * wrote. */
class FileSinkSpec extends SparkTestBase {
  import StreamingSpec.Ev

  private def ev(id: Long, minute: Int, typ: String): Ev = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Ev(id, new Timestamp(base + minute * 60000L), id % 5L, typ, 1.0)
  }

  test("append-mode parquet sink is exactly-once across a restart") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val out = Files.createTempDirectory("graft-file-sink").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    def start(source: MemoryStream[Ev]) =
      StreamRunner.tumblingCounts(source.toDF(), watermark = "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // run 1: hours 0 and 1, then an hour-3 event pushes the watermark
    // past both windows so they finalize and hit the files
    val s1 = MemoryStream[Ev]
    val q1 = start(s1)
    s1.addData(ev(1, 5, "click"), ev(2, 20, "click"), ev(3, 70, "view"))
    q1.processAllAvailable()
    s1.addData(ev(4, 190, "view"))
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = spark.read.parquet(out)
    assert(afterRun1.count() === 2) // (h0 click ×2), (h1 view ×1)

    // run 2: SAME checkpoint, new source pre-seeded with run 1's data
    // (MemoryStream state is not durable; the checkpoint replays offsets
    // against it) plus an hour-4 event that finalizes hour 3
    val s2 = MemoryStream[Ev]
    s2.addData(ev(1, 5, "click"), ev(2, 20, "click"), ev(3, 70, "view"))
    s2.addData(ev(4, 190, "view"))
    val q2 = start(s2)
    q2.processAllAvailable()
    s2.addData(ev(5, 250, "click"))
    q2.processAllAvailable()
    q2.stop()

    val fin = spark.read.parquet(out)
    // exactly-once: hours 0 and 1 appear ONCE each despite the restart;
    // hour 3 (event 4) was finalized by run 2
    assert(fin.count() === 3)
    val rows = fin.select(col("ws"), col("event_type"), col("cnt"))
      .orderBy("ws").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("2024-01-01 00:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "view", 1L),
      ("2024-01-01 03:00:00.0", "view", 1L)))
  }
}
