package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Runs the StreamRunner transforms through a real MemoryStream source
  * (incremental execution, watermark state) and checks the streamed
  * result equals the same transform applied statically — the
  * batch/stream unification contract. */
class StreamingSpec extends SparkTestBase {
  import StreamingSpec.Ev

  private def mkEvents: Seq[Ev] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 200).map { i =>
      Ev(i.toLong, new Timestamp(base + i * 97L * 1000), i % 7L,
        Seq("click", "view", "purchase")(i % 3), i * 1.5)
    }
  }

  private def runStream(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      outputMode: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val sink = s"stream_sink_${System.nanoTime()}"
    val q = transform(source.toDF())
      .writeStream.format("memory").queryName(sink)
      .outputMode(outputMode).start()
    // two batches to exercise incremental state
    val (first, second) = mkEvents.splitAt(120)
    source.addData(first: _*)
    q.processAllAvailable()
    source.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    spark.table(sink)
  }

  test("streamed tumbling counts equal the static computation") {
    import spark.implicits._
    val streamed = runStream(StreamRunner.tumblingCounts(_), "complete")
      .orderBy("ws", "event_type").collect()
    val static = StreamRunner.tumblingCounts(mkEvents.toDF())
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq === static.toSeq)
  }

  test("streamed daily actives (sketch state) equal the static computation") {
    import spark.implicits._
    val streamed = runStream(StreamRunner.dailyActives(_), "complete")
      .orderBy("day").collect()
    val static = StreamRunner.dailyActives(mkEvents.toDF())
      .orderBy("day").collect()
    assert(streamed.toSeq === static.toSeq)
    // the 200-event fixture spans 7 distinct users in one day — the
    // rsd=0.01 sketch must be exact at this cardinality
    assert(streamed.map(_.getLong(1)).toSeq === Seq(7L))
  }

  test("streamed session windows equal the static computation") {
    import spark.implicits._
    val streamed = runStream(StreamRunner.sessionCounts(_), "complete")
      .orderBy("user_id", "session_start").collect()
    val static = StreamRunner.sessionCounts(mkEvents.toDF())
      .orderBy("user_id", "session_start").collect()
    assert(streamed.toSeq === static.toSeq)
  }

  test("streamed interval join equals the static computation") {
    import spark.implicits._
    // 25-minute window: in the fixture (type = i%3, user = i%7) the
    // nearest same-user click precedes a purchase by 14 events ≈ 22.6
    // min, so the default 10 minutes would match nothing
    val tf = (df: org.apache.spark.sql.DataFrame) =>
      StreamRunner.clicksBeforePurchase(
        df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "purchase"),
        interval = "25 minutes")
    val streamed = runStream(tf, "append")
      .orderBy("purchase_id", "c_ts").collect()
    val static = tf(mkEvents.toDF())
      .orderBy("purchase_id", "c_ts").collect()
    assert(streamed.nonEmpty && streamed.toSeq === static.toSeq)
  }

  test("streamed left-outer interval join: matches exact, nulls watermark-gated") {
    import spark.implicits._
    val tf = (df: org.apache.spark.sql.DataFrame) =>
      StreamRunner.clicksBeforePurchase(
        df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "purchase"),
        watermark = "30 minutes", interval = "25 minutes",
        joinType = "leftOuter")
    val streamed = runStream(tf, "append").collect()
    val static = tf(mkEvents.toDF()).collect()
    // output columns: purchase_id, user_id, p_ts, c_user, c_ts
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(4).getTime)
    val streamedMatched = streamed.filter(!_.isNullAt(4)).map(key).toSet
    val staticMatched = static.filter(!_.isNullAt(4)).map(key).toSet
    // matched rows are exact — inner results never wait on the watermark
    assert(streamedMatched == staticMatched)
    // null (unmatched) rows: only for purchases the watermark cleared,
    // so a subset of the static unmatched set — and the old region of
    // the fixture must actually have emitted some
    val streamedNulls = streamed.filter(_.isNullAt(4)).map(_.getLong(0)).toSet
    val staticNulls = static.filter(_.isNullAt(4)).map(_.getLong(0)).toSet
    assert(streamedNulls.subsetOf(staticNulls), streamedNulls -- staticNulls)
    assert(streamedNulls.nonEmpty,
      "watermark should have cleared some unmatched purchases")
  }

  test("flatMapGroupsWithState accumulates per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val sink = s"state_sink_${System.nanoTime()}"
    val typed = (df: org.apache.spark.sql.DataFrame) =>
      StreamRunner.runningUserTotals(
        df.as[StreamRunner.UserEvent])
    val q = typed(source.toDF())
      .writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    val (first, second) = mkEvents.splitAt(120)
    source.addData(first: _*)
    q.processAllAvailable()
    source.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    // last update per user = final accumulated state
    val finalTotals = spark.table(sink)
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max(col("total_value")).as("total_value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val expected = mkEvents.groupBy(_.user_id).map { case (u, evs) =>
      u -> (evs.size.toLong, evs.map(_.value).sum)
    }
    assert(finalTotals.keySet === expected.keySet)
    for ((u, (n, tot)) <- expected) {
      assert(finalTotals(u)._1 === n, s"count for user $u")
      assert(math.abs(finalTotals(u)._2 - tot) < 1e-6, s"total for user $u")
    }
  }

  test("stream_state's relative tolerance holds at large magnitudes " +
      "where an absolute epsilon cannot") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // per-user totals around 1e12: double sums in different orders
    // disagree by ~1e-4 absolute here (>> the old 1e-6 absolute bound)
    // while agreeing to ~1 ulp relative
    val big = (0 until 300).map { i =>
      Ev(i.toLong, new Timestamp(base + i * 1000L), i % 5L, "click",
        1.0e10 + i * 1.23456789e7)
    }
    val typed = big.toDF()
      .as[StreamRunner.UserEvent]
    val stateSide = StreamRunner.runningUserTotals(typed).toDF()
      .select(col("user_id"), col("n_events").as("s_n"),
        col("total_value").as("s_total"))
    val batchSide = big.toDF().groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("b_total"))
    val rows = batchSide.join(stateSide, Seq("user_id"))
      .select(col("user_id"),
        (col("s_n") === col("n_events") &&
          abs(col("s_total") - col("b_total")) <=
            lit(1e-9) * greatest(abs(col("s_total")),
              abs(col("b_total")), lit(1.0))).as("rel_ok"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(1)),
      rows.filterNot(_.getBoolean(1)).mkString(","))
  }

  test("streaming near-dup filter drops band-colliding docs, passes distinct") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[StreamingSpec.Doc]
    val sink = s"neardup_sink_${System.nanoTime()}"
    val q = StreamRunner.nearDupFilter(source.toDF())
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def doc(id: Long, offSec: Int, text: String) =
      StreamingSpec.Doc(id, new Timestamp(base + offSec * 1000L), text)
    // batch 1: two distinct docs
    source.addData(
      doc(1, 0, "the quick brown fox jumps over the lazy dog"),
      doc(2, 1, "entirely different words about spark streaming state"))
    q.processAllAvailable()
    // batch 2: an exact dup of doc 1 (same tokens → same signature →
    // same band key → dropped), one more distinct doc, and two
    // null/empty-text docs (no dup evidence — must BOTH pass, not
    // collide on a null band key)
    source.addData(
      doc(3, 2, "quick brown fox jumps over the lazy dog the"),
      doc(4, 3, "yet another unrelated document with fresh vocabulary"),
      doc(5, 4, null),
      doc(6, 5, ""))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table(sink).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept === Array(1L, 2L, 4L, 5L, 6L), kept.mkString(","))
  }

  test("continuous clean→load: streaming micro-batches equal the batch path") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.schemas.Schemas
    import org.apache.spark.sql.types._
    // a small declared schema exercising the width check, date parse,
    // decimal cast, and ''→NULL — the full Clean→Load surface
    val tdef = Schemas.TableDef(
      name = "stream_raw",
      schema = StructType(Seq(
        StructField("rec_id", LongType),
        StructField("eff_date", DateType),
        StructField("amount", DecimalType(14, 2)),
        StructField("label", StringType))),
      uniqueKey = Seq("rec_id"),
      dateFields = Seq("eff_date"))
    val lines = Seq(
      "1\t1/15/2014\t12.34\talpha",
      "2\t2/30/2014\tgarbage\t",      // bad date + bad decimal + ''→NULL
      "3\t12/31/2013\t0.01\tbeta",
      "too\tfew",                      // width reject → side-channel
      "4\t1/1/2014\t5.00\tgamma\textra") // too wide → side-channel
    val source = MemoryStream[String]
    val (typed, bad) = StreamRunner.cleanLoadStream(tdef,
      source.toDF().select(col("value")))
    val goodSink = s"clean_good_${System.nanoTime()}"
    val badSink = s"clean_bad_${System.nanoTime()}"
    val qg = typed.writeStream.format("memory").queryName(goodSink)
      .outputMode("append").start()
    val qb = bad.writeStream.format("memory").queryName(badSink)
      .outputMode("append").start()
    // two micro-batches to prove incremental append semantics
    val (b1, b2) = lines.splitAt(2)
    source.addData(b1: _*); qg.processAllAvailable(); qb.processAllAvailable()
    source.addData(b2: _*); qg.processAllAvailable(); qb.processAllAvailable()
    qg.stop(); qb.stop()
    // streamed result == the batch path over the same lines
    val (batchTyped, batchBad) = StreamRunner.cleanLoadStream(tdef,
      lines.toDF("value"))
    val streamed = spark.table(goodSink).orderBy("rec_id").collect().toSeq
    assert(streamed === batchTyped.orderBy("rec_id").collect().toSeq)
    assert(spark.table(badSink).count() === batchBad.count())
    assert(spark.table(badSink).count() === 2)
    // spot-check the typed semantics survived the stream boundary
    val r2 = streamed.find(_.getLong(0) == 2L).get
    assert(r2.isNullAt(r2.fieldIndex("eff_date")))  // 2/30 invalid
    assert(r2.isNullAt(r2.fieldIndex("amount")))    // garbage decimal
    assert(r2.isNullAt(r2.fieldIndex("label")))     // '' → NULL
  }

  test("per-micro-batch tracking metrics drain to the batch totals") {
    // the lineage layer riding the stream (≙ tracking_verify's
    // RawDataFile counts, per micro-batch): foreachBatch runs the same
    // Clean→Load on each batch and emits a Tracking.FileMetrics row;
    // every row must satisfy the verify invariants, and the drained
    // sums must equal the one batch-path row over the same lines —
    // closing the streaming↔lineage seam.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ingest.{Clean, Load}
    import graft.meta.Tracking
    import graft.schemas.Schemas
    import org.apache.spark.sql.types._
    val tdef = Schemas.TableDef(
      name = "stream_raw",
      schema = StructType(Seq(
        StructField("rec_id", LongType),
        StructField("eff_date", DateType),
        StructField("amount", DecimalType(14, 2)),
        StructField("label", StringType))),
      uniqueKey = Seq("rec_id"),
      dateFields = Seq("eff_date"))
    val lines = Seq(
      "1\t1/15/2014\t12.34\talpha",
      "2\t2/30/2014\tgarbage\t",
      "3\t12/31/2013\t0.01\tbeta",
      "too\tfew",
      "4\t1/1/2014\t5.00\tgamma\textra")
    val source = MemoryStream[String]
    val metrics = scala.collection.mutable.ArrayBuffer.empty[Tracking.FileMetrics]
    val q = source.toDF().select(col("value")).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val cleaned = Clean.clean(tdef, batch)
        val typed = Load.load(tdef, cleaned.good)
        metrics.synchronized {
          metrics += Tracking.forTable(s"stream_raw_b$id", cleaned, typed)
        }
        ()
      }
      .start()
    val (b1, b2) = lines.splitAt(2)
    source.addData(b1: _*); q.processAllAvailable()
    source.addData(b2: _*); q.processAllAvailable()
    q.stop()
    assert(metrics.size === 2)
    assert(metrics.forall(_.consistent),
      metrics.filterNot(_.consistent).mkString(", "))
    val batchCleaned = Clean.clean(tdef, lines.toDF("value"))
    val batchM = Tracking.forTable("stream_raw", batchCleaned,
      Load.load(tdef, batchCleaned.good))
    assert(metrics.map(_.downloadRecords).sum === batchM.downloadRecords)
    assert(metrics.map(_.cleanRecords).sum === batchM.cleanRecords)
    assert(metrics.map(_.loadRecords).sum === batchM.loadRecords)
    assert(metrics.map(_.errorRecords).sum === batchM.errorRecords)
    assert(batchM.errorRecords === 2) // the width rejects
  }

  test("streaming latest-amendment view converges to the batch result") {
    // W1 as an always-current view: amendments arrive out of order
    // across micro-batches; after the stream drains, the last emitted
    // winner per logical key must equal Load.latestAmendment over the
    // same rows. Also proves the late-amendment semantics: a replayed
    // OLD amendment must not displace a newer winner.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.schemas.Schemas
    val tdef = Schemas.TableDef(
      name = "amend_stream",
      schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("filing_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("amend_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("amount",
          org.apache.spark.sql.types.DoubleType))),
      uniqueKey = Seq("filing_id", "amend_id"))
    val source = MemoryStream[(Long, Long, Double)]
    val sink = s"amend_view_${System.nanoTime()}"
    val q = StreamRunner.latestAmendmentStream(tdef,
        source.toDF().toDF("filing_id", "amend_id", "amount"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    // batch 1: originals + one amendment
    source.addData((1L, 0L, 10.0), (2L, 0L, 20.0), (1L, 1L, 11.0))
    q.processAllAvailable()
    // batch 2: new filing, newer amendment for 2, REPLAYED old row for 1
    source.addData((3L, 0L, 30.0), (2L, 2L, 22.0), (1L, 0L, 10.0))
    q.processAllAvailable()
    q.stop()
    // last update per key wins in the memory sink
    val finalView = spark.table(sink)
      .withColumn("__ord", monotonically_increasing_id())
      .orderBy(col("__ord").desc).drop("__ord")
      .collect().toSeq
      .groupBy(_.getLong(0)).map { case (_, rs) => rs.head }
      .toSeq.sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.ingest.Load.latestAmendment(tdef,
        Seq((1L, 0L, 10.0), (2L, 0L, 20.0), (1L, 1L, 11.0),
          (3L, 0L, 30.0), (2L, 2L, 22.0), (1L, 0L, 10.0))
          .toDF("filing_id", "amend_id", "amount"))
      .collect().toSeq.sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(finalView === batch)
    assert(finalView === Seq((1L, 1L, 11.0), (2L, 2L, 22.0),
      (3L, 0L, 30.0)))
  }

  test("latest-amendment state keys keep collision-prone tuples separate") {
    // Regression for the composite-state-key encoding: with a naive
    // concat (or any plain separator) the multi-string keys ("A","BC")
    // and ("AB","C") collapse into one state cell and a NULL key part
    // collides with the literal string "null" — the later amendment
    // would then silently supersede an UNRELATED logical record. The
    // length-prefixed encoding must keep all four logical records
    // distinct and each must converge to its own winner.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.schemas.Schemas
    val tdef = Schemas.TableDef(
      name = "amend_collide",
      schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rec_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("form_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("amend_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("amount",
          org.apache.spark.sql.types.DoubleType))),
      uniqueKey = Seq("rec_type", "form_type", "amend_id"))
    val source = MemoryStream[(String, String, Long, Double)]
    val sink = s"amend_collide_${System.nanoTime()}"
    val q = StreamRunner.latestAmendmentStream(tdef,
        source.toDF().toDF("rec_type", "form_type", "amend_id", "amount"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    source.addData(
      ("A", "BC", 0L, 1.0), ("AB", "C", 0L, 2.0), // concat-colliding pair
      ("null", "X", 0L, 3.0), (null, "X", 0L, 4.0)) // null vs "null"
    q.processAllAvailable()
    source.addData(
      ("A", "BC", 5L, 10.0), // amends ONLY ("A","BC")
      (null, "X", 7L, 40.0)) // amends ONLY the null-keyed record
    q.processAllAvailable()
    q.stop()
    val finalView = spark.table(sink)
      .withColumn("__ord", monotonically_increasing_id())
      .orderBy(col("__ord").desc).drop("__ord")
      .collect().toSeq
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (_, rs) => rs.head }
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
      .toSet
    assert(finalView === Set(
      ("A", "BC", 5L, 10.0), // amended
      ("AB", "C", 0L, 2.0), // must NOT have been displaced by ("A","BC")
      ("null", "X", 0L, 3.0), // must NOT have been displaced by the null key
      (null, "X", 7L, 40.0))) // amended
  }

  test("stateful dedup drops replayed event_ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val sink = s"dedup_sink_${System.nanoTime()}"
    val q = StreamRunner.dedupEvents(source.toDF())
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val evs = mkEvents.take(50)
    source.addData(evs: _*)
    q.processAllAvailable()
    source.addData(evs: _*) // exact replay — all dups
    q.processAllAvailable()
    q.stop()
    assert(spark.table(sink).count() === 50)
  }
}

object StreamingSpec {
  // top-level so Spark can derive an Encoder (inner classes can't)
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}
