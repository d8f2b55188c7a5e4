package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Epoch-MV pins: each refresh publishes a new generation and the
  * Catalyst rewrite re-points atomically (the served plan scans
  * EXACTLY one generation — the newest); a frame planned against the
  * old generation keeps reading it after the flip; ledger replays
  * no-op; the delete leg (min/max recount included) rides the same
  * frames as the swap layout. */
class EpochMvSpec extends SparkTestBase {

  import spark.implicits._

  test("generation flips are atomic for the rewrite; pinned frames " +
      "survive; ledger replays no-op; delete recount rides epochs") {
    val base = s"${graft.GraftSession.scratchDir}/emv_base"
    val layout = s"${graft.GraftSession.scratchDir}/emv_layout"
    Seq(("A", 1.0), ("A", 4.0), ("B", 5.0))
      .toDF("f", "q")
      .write.mode("overwrite").parquet(base)
    val d = EpochMv.EpochMvDef(base, layout, Seq("f"),
      Seq(MatView.AggSpec("sum", "q", Some(DecimalType(38, 2)),
          "sum_p"),
        MatView.AggSpec("count", "", None, "cnt_p"),
        MatView.AggSpec("min", "q", None, "min_p"),
        MatView.AggSpec("max", "q", None, "max_p")))
    EpochMv.create(spark, d)
    def q() = spark.read.parquet(base).groupBy(col("f"))
      .agg(sum(col("q").cast(DecimalType(38, 2))).as("s"),
        count(lit(1)).as("n"), min(col("q")).as("mn"),
        max(col("q")).as("mx"))
    def plansOn(gen: String): Boolean =
      q().queryExecution.executedPlan.toString.contains(s"$gen/view")
    try {
      assert(plansOn("g0"))
      val cells0 = q().collect().map(r => (r.getString(0),
        r.getLong(2))).toMap

      // a frame PLANNED against generation 0 before the flip
      val pinned = spark.read.parquet(s"$layout/g0/view")
      // grow the base, refresh as generation 1
      val delta = Seq(("B", 7.0), ("C", 2.0)).toDF("f", "q")
      delta.write.mode("append").parquet(base)
      EpochMv.refresh(spark, d, delta, batchId = 1L)
      assert(plansOn("g1") && !plansOn("g0"),
        q().queryExecution.executedPlan.toString.take(2000))
      assert(q().collect().map(r => (r.getString(0), r.getLong(2)))
        .toMap === Map("A" -> 2L, "B" -> 2L, "C" -> 1L))
      // the pre-flip frame still reads generation 0 (on disk until
      // prune) — the snapshot a mid-flight dashboard query holds
      assert(pinned.count() === 2L)
      // ledger replay: same batch id commits nothing
      EpochMv.refresh(spark, d, delta, batchId = 1L)
      assert(graft.ops.Epoch.resolve(spark, layout).get.epoch === 1L)

      // delete leg with min/max → the targeted recount, as an epoch;
      // takedown-first ordering (view before base shrink)
      val doomed = Seq(("B", 7.0)).toDF("f", "q")
      EpochMv.refreshDelete(spark, d, doomed, batchId = 2L)
      graft.ops.Layout.replaceDir(spark,
        spark.read.parquet(base)
          .where(!(col("f") === "B" && col("q") === 7.0)), base)
      assert(plansOn("g2"))
      val after = q().collect()
        .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1).toSeq
      assert(after === Seq(("A", 1.0, 4.0), ("B", 5.0, 5.0),
        ("C", 2.0, 2.0)))
      // replay of the delete batch: ledger no-op
      EpochMv.refreshDelete(spark, d, doomed, batchId = 2L)
      assert(graft.ops.Epoch.resolve(spark, layout).get.epoch === 2L)
      // prune retires g0/g1; the current generation keeps serving
      graft.ops.Epoch.prune(spark, layout, keep = 1)
      assert(!new java.io.File(s"$layout/g0").exists())
      assert(q().collect().length === 3)
      assert(cells0 === Map("A" -> 2L, "B" -> 1L)) // untouched capture
    } finally MatView.deregister(base)
  }

  test("streaming refresh drains micro-batches into generations " +
      "exactly-once; drained view ≡ rebuild through the rewrite") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = s"${graft.GraftSession.scratchDir}/emv_sbase"
    val layout = s"${graft.GraftSession.scratchDir}/emv_slayout"
    Seq(("A", 1.0)).toDF("f", "q")
      .write.mode("overwrite").parquet(base)
    val d = EpochMv.EpochMvDef(base, layout, Seq("f"),
      Seq(MatView.AggSpec("sum", "q", Some(DecimalType(38, 2)),
          "sum_p"),
        MatView.AggSpec("count", "", None, "cnt_p")))
    EpochMv.create(spark, d)
    try {
      val source = MemoryStream[(String, Double)]
      val q = graft.streaming.StreamRunner.mvRefreshEpochStream(d,
        source.toDF().toDF("f", "q")) { (b, _) =>
        b.write.mode("append").parquet(base)
      }
      source.addData("A" -> 2.0, "B" -> 3.0)
      q.processAllAvailable()
      source.addData("B" -> 4.0)
      q.processAllAvailable()
      q.stop()
      val m = graft.ops.Epoch.resolve(spark, layout).get
      assert(m.epoch === 2L && m.has("app_0") && m.has("app_1"))
      // replay of batch 0's payload under its id: ledger no-op
      EpochMv.refresh(spark, d,
        Seq("A" -> 2.0, "B" -> 3.0).toDF("f", "q"), batchId = 0L)
      assert(graft.ops.Epoch.resolve(spark, layout).get.epoch === 2L)
      // the rewrite serves the drained state ≡ from-scratch rebuild
      val served = spark.read.parquet(base).groupBy(col("f"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(served === Map("A" -> 2L, "B" -> 2L))
    } finally MatView.deregister(base)
  }

  test("live CDC → MV maintenance: a $changes subscription drives the " +
      "view across merge/delta/takedown epochs exactly-once; the view " +
      "never re-reads its base") {
    val tbl = s"${graft.GraftSession.scratchDir}/emv_cdc_tbl"
    val base = s"${graft.GraftSession.scratchDir}/emv_cdc_base"
    val layout = s"${graft.GraftSession.scratchDir}/emv_cdc_view"
    val ckpt = s"${graft.GraftSession.scratchDir}/emv_cdc_ckpt"
    def rows(xs: (Long, String, Double)*) =
      xs.toSeq.toDF("event_id", "grp", "v")
    graft.ops.EpochTable.refresh(spark, tbl,
      rows((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0)),
      version = 0L)
    graft.sources.EpochTableCatalog.register(spark, "gmv",
      graft.GraftSession.scratchDir)
    spark.read.parquet(s"$tbl/g0/data").select("grp", "v")
      .write.mode("overwrite").parquet(base)
    val d = EpochMv.EpochMvDef(base, layout, Seq("grp"),
      Seq(MatView.AggSpec("sum", "v", Some(DecimalType(38, 2)),
          "sum_p"),
        MatView.AggSpec("count", "", None, "cnt_p")))
    EpochMv.create(spark, d)
    val q = graft.streaming.StreamRunner.mvMaintainStream(spark, tbl,
      d, keys = Seq("event_id"),
      shape = df => df.select("grp", "v"),
      changesTable = "gmv.`emv_cdc_tbl$changes`",
      checkpoint = Some(ckpt))
    def view(): Map[String, (Double, Long)] =
      spark.read.parquet(EpochMv.currentDef(spark, d).mvPath)
        .collect().map(r => r.getAs[String]("grp") ->
          ((r.getDecimal(1).doubleValue(), r.getAs[Long]("cnt_p"))))
        .toMap
    try {
      // a merge that MIGRATES key 2 from group A to B and inserts 4
      graft.ops.EpochTable.merge(spark, tbl,
        rows((2L, "B", 2.0), (4L, "C", 4.0)), version = 1L,
        keys = Seq("event_id"))
      q.processAllAvailable()
      assert(view() === Map("A" -> ((1.0, 1L)), "B" -> ((5.0, 2L)),
        "C" -> ((4.0, 1L))))
      // a delta and a takedown in the next batch
      graft.ops.EpochTable.refreshDelta(spark, tbl,
        rows((5L, "A", 5.0)), version = 2L)
      graft.ops.EpochTable.delete(spark,
        Seq(3L).toDF("event_id"), tbl, batchId = 1L)
      q.processAllAvailable()
      assert(view() === Map("A" -> ((6.0, 2L)), "B" -> ((2.0, 1L)),
        "C" -> ((4.0, 1L))))
    } finally { q.stop(); MatView.deregister(base) }
    // restart on the same checkpoint: nothing re-applies, new
    // changes still flow
    val q2 = graft.streaming.StreamRunner.mvMaintainStream(spark, tbl,
      d, keys = Seq("event_id"),
      shape = df => df.select("grp", "v"),
      changesTable = "gmv.`emv_cdc_tbl$changes`",
      checkpoint = Some(ckpt))
    try {
      q2.processAllAvailable()
      assert(view() === Map("A" -> ((6.0, 2L)), "B" -> ((2.0, 1L)),
        "C" -> ((4.0, 1L))))
      graft.ops.EpochTable.refreshDelta(spark, tbl,
        rows((6L, "B", 6.0)), version = 3L)
      q2.processAllAvailable()
      assert(view() === Map("A" -> ((6.0, 2L)), "B" -> ((8.0, 2L)),
        "C" -> ((4.0, 1L))))
    } finally { q2.stop(); MatView.deregister(base) }
  }
}
