package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Table-tier epochs (round-16 verdict "next" #1): each update run is
  * one RawDataVersion-shaped epoch — a reader racing a refresh keeps
  * its pinned version (never a torn read across the flip), every
  * retained version stays queryable by id, replayed versions are
  * ledger no-ops, and the metrics row flips with the data it counts. */
class EpochTableSpec extends SparkTestBase {

  import spark.implicits._

  private def mkTyped(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i", i * 10L)).toDF("event_id", "etype", "uid")

  test("a reader racing a refresh serves wholly version 0 or wholly " +
      "version 1; a pinned manifest survives the flip") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_race"
    EpochTable.refresh(spark, path, mkTyped(1L to 50L), version = 0L)
    val m0 = Epoch.resolve(spark, path).get
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val refresher = Future {
        EpochTable.refresh(spark, path, mkTyped(1L to 120L), version = 1L)
      }
      // every racing read must count exactly one version's rows —
      // a torn read (partially visible new snapshot) lands between
      var served = 0
      while (!refresher.isCompleted || served == 0) {
        val n = EpochTable.serve(spark, path).count()
        served += 1
        assert(n == 50L || n == 120L,
          s"torn table read: $n rows is neither version")
      }
      Await.result(refresher, 120.seconds)
    } finally pool.shutdownNow()
    assert(EpochTable.serve(spark, path).count() === 120L)
    // the manifest pinned before the refresh still serves version 0
    assert(EpochTable.data(spark, path, m0).count() === 50L)
    // ... and so does the version-id lookup after the flip
    assert(EpochTable.dataForVersion(spark, path, 0L).get.count() === 50L)
    assert(EpochTable.dataForVersion(spark, path, 1L).get.count() === 120L)
    assert(EpochTable.dataForVersion(spark, path, 7L).isEmpty)
  }

  test("a replayed version is a ledger no-op returning the committed " +
      "count; versions() carries the verify invariant per retained row") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_once"
    assert(EpochTable.refresh(spark, path, mkTyped(1L to 30L),
      version = 0L, downloadRecords = Some(33L), errorRecords = 3L) === 30L)
    // replay: different frame, same version — nothing committed, the
    // original count comes back
    assert(EpochTable.refresh(spark, path, mkTyped(1L to 999L),
      version = 0L) === 30L)
    assert(Epoch.committedList(spark, path) === Seq(0L))
    assert(EpochTable.serve(spark, path).count() === 30L)
    EpochTable.refresh(spark, path, mkTyped(1L to 40L), version = 1L)
    val v = EpochTable.versions(spark, path).orderBy("version").collect()
    assert(v.map(_.getAs[Long]("version")).toSeq === Seq(0L, 1L))
    assert(v(0).getAs[Long]("download_records") === 33L)
    assert(v(0).getAs[Long]("clean_records") === 30L)
    assert(v(0).getAs[Long]("error_records") === 3L)
    assert(v.forall(_.getAs[Boolean]("consistent")))
    // prune retires version 0's history; the version lookup goes None
    Epoch.prune(spark, path, keep = 1)
    assert(EpochTable.dataForVersion(spark, path, 0L).isEmpty)
    assert(EpochTable.dataForVersion(spark, path, 1L).get.count() === 40L)
  }

  test("delta versions accumulate referenced dirs with cumulative " +
      "metrics; compact folds them; the sweep's epoch_table arm " +
      "triggers on segment count") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_delta"
    assert(EpochTable.refresh(spark, path, mkTyped(1L to 50L),
      version = 0L) === 50L)
    assert(EpochTable.refreshDelta(spark, path, mkTyped(51L to 80L),
      version = 1L, errorDelta = 2L) === 80L)
    assert(EpochTable.serve(spark, path).count() === 80L)
    // the delta epoch REFERENCES v0's directory (two dirs, no rewrite)
    assert(Epoch.resolve(spark, path).get.components("data").size === 2)
    // replayed delta: ledger no-op returning the committed cumulative
    assert(EpochTable.refreshDelta(spark, path, mkTyped(1L to 9L),
      version = 1L) === 80L)
    assert(Epoch.committedList(spark, path) === Seq(0L, 1L))
    val v1 = EpochTable.versions(spark, path)
      .where(col("version") === 1L).head()
    assert(v1.getAs[Long]("load_records") === 80L)
    assert(v1.getAs[Long]("error_records") === 2L)
    assert(v1.getAs[Long]("download_records") === 82L)
    assert(v1.getAs[Boolean]("consistent"))
    // sweep: segment count trips the epoch_table compact arm
    val r = Maintenance.sweep(spark,
      Seq(Maintenance.LayoutRef("epoch_table", path)),
      Maintenance.Policy(maxSegments = 1, maxTombstoneRatio = 0.99))
    assert(r.map(_.action) === Seq("compact"))
    assert(Epoch.resolve(spark, path).get.components("data").size === 1)
    assert(EpochTable.serve(spark, path).count() === 80L)
    // versions() stays one row per version (compact carries meta
    // forward verbatim), and the version lookup resolves post-compact
    assert(EpochTable.versions(spark, path).count() === 2L)
    assert(EpochTable.dataForVersion(spark, path, 1L).get.count() === 80L)
  }

  test("row takedown: delete hides rows from every read face, compact " +
      "drops them physically, replays no-op, history counts untouched") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_takedown"
    EpochTable.refresh(spark, path, mkTyped(1L to 60L), version = 0L)
    val m0 = Epoch.resolve(spark, path).get
    EpochTable.delete(spark,
      (1L to 60L).filter(_ % 4 == 0).toDF("event_id"), path,
      batchId = 1L)
    assert(EpochTable.serve(spark, path).count() === 45L)
    // the pinned pre-delete manifest still serves all 60
    assert(EpochTable.data(spark, path, m0).count() === 60L)
    // version lookup serves the survivors (the tombstone rides the
    // version's CURRENT manifest)
    assert(EpochTable.dataForVersion(spark, path, 0L).get.count() === 45L)
    // replay + already-tombstoned-ids batches commit nothing
    val epochs = Epoch.committedList(spark, path)
    EpochTable.delete(spark, Seq(4L, 8L).toDF("event_id"), path,
      batchId = 1L)
    EpochTable.delete(spark, Seq(4L, 8L).toDF("event_id"), path,
      batchId = 2L)
    assert(Epoch.committedList(spark, path) === epochs)
    // meta counts are release history — deletes never rewrite them
    assert(EpochTable.versions(spark, path).head()
      .getAs[Long]("load_records") === 60L)
    EpochTable.compact(spark, path)
    assert(Epoch.resolve(spark, path).get.components("tombstones").isEmpty)
    assert(EpochTable.serve(spark, path).count() === 45L)
  }

  test("merge: upserts replace by key and insert new keys; newest " +
      "merge generation wins; tombstone beats merge; compact folds") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_merge"
    EpochTable.refresh(spark, path, mkTyped(1L to 50L), version = 0L)
    // one batch carrying both kinds: ids 1..10 replaced, 51..55 new
    val up1 = ((1L to 10L) ++ (51L to 55L))
      .map(i => (i, s"u1_$i", i * 100L))
      .toDF("event_id", "etype", "uid")
    assert(EpochTable.merge(spark, path, up1, version = 1L,
      keys = Seq("event_id")) === 55L)
    val served = EpochTable.serve(spark, path)
    assert(served.count() === 55L)
    assert(served.where(col("event_id") === 3L).head()
      .getAs[String]("etype") === "u1_3")
    assert(served.where(col("event_id") === 20L).head()
      .getAs[String]("etype") === "v20")
    // replay: ledger no-op returning the committed cumulative count
    assert(EpochTable.merge(spark, path, mkTyped(900L to 999L),
      version = 1L, keys = Seq("event_id")) === 55L)
    // a second merge shadows the first on overlapping keys
    val up2 = Seq((3L, "u2_3", 42L)).toDF("event_id", "etype", "uid")
    assert(EpochTable.merge(spark, path, up2, version = 2L,
      keys = Seq("event_id")) === 55L)
    assert(EpochTable.serve(spark, path)
      .where(col("event_id") === 3L).head()
      .getAs[String]("etype") === "u2_3")
    // metrics: updates leave load flat, inserts grow it
    val v = EpochTable.versions(spark, path).orderBy("version").collect()
    assert(v.map(_.getAs[Long]("load_records")).toSeq ===
      Seq(50L, 55L, 55L))
    // a takedown tombstone beats a merged value
    EpochTable.delete(spark, Seq(3L).toDF("event_id"), path, batchId = 9L)
    assert(EpochTable.serve(spark, path)
      .where(col("event_id") === 3L).isEmpty)
    // compact folds merge generations + tombstones into one snapshot
    EpochTable.compact(spark, path)
    val m = Epoch.resolve(spark, path).get
    assert(m.components.getOrElse("merge", Seq.empty).isEmpty)
    assert(m.components("data").size === 1)
    assert(EpochTable.serve(spark, path).count() === 54L)
    assert(EpochTable.serve(spark, path)
      .where(col("event_id") === 5L).head()
      .getAs[String]("etype") === "u1_5")
  }

  test("merge validation: duplicate-key batches, schema drift, and " +
      "key mismatch against accumulated merges all fail loudly") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_merge_val"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    val dup = Seq((1L, "a", 1L), (1L, "b", 2L))
      .toDF("event_id", "etype", "uid")
    intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path, dup, version = 1L,
        keys = Seq("event_id"))
    }
    intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path,
        Seq((1L, "a")).toDF("event_id", "etype"), version = 1L,
        keys = Seq("event_id"))
    }
    // null keys cannot shadow (null ≠ null in the anti-join) — refused
    intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path,
        Seq((Option.empty[Long], "a", 1L))
          .toDF("event_id", "etype", "uid"),
        version = 1L, keys = Seq("event_id"))
    }
    EpochTable.merge(spark, path,
      Seq((1L, "a", 1L)).toDF("event_id", "etype", "uid"),
      version = 1L, keys = Seq("event_id"))
    // keys must match the accumulated merges' until a compact folds
    intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path,
        Seq((2L, "b", 2L)).toDF("event_id", "etype", "uid"),
        version = 2L, keys = Seq("etype"))
    }
  }

  test("schema evolution: an old version serves its own schema " +
      "verbatim, aligns to the current schema with typed NULLs, and " +
      "non-additive drift fails loudly") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_evolve"
    EpochTable.refresh(spark, path,
      mkTyped(1L to 20L).drop("uid"), version = 0L)
    EpochTable.refresh(spark, path, mkTyped(1L to 30L), version = 1L)
    // historical fidelity: version 0 as written, no uid column
    val old = EpochTable.dataForVersion(spark, path, 0L).get
    assert(old.columns.sorted === Array("etype", "event_id"))
    // aligned: uid present, typed NULL, current column order
    val aligned =
      EpochTable.dataForVersionAsCurrent(spark, path, 0L).get
    assert(aligned.columns === EpochTable.serve(spark, path).columns)
    assert(aligned.count() === 20L)
    assert(aligned.where(col("uid").isNotNull).isEmpty)
    assert(aligned.schema("uid").dataType ===
      org.apache.spark.sql.types.LongType)
    // a delta whose schema drifted from the served table is refused
    intercept[IllegalArgumentException] {
      EpochTable.refreshDelta(spark, path,
        mkTyped(31L to 35L).drop("uid"), version = 2L)
    }
    // non-additive: current drops a column the old version carried
    EpochTable.refresh(spark, path, mkTyped(1L to 30L).drop("etype"),
      version = 3L)
    intercept[IllegalArgumentException] {
      EpochTable.dataForVersionAsCurrent(spark, path, 1L).get.count()
    }
  }

  test("tableIngestEpochStream: one delta version per micro-batch, " +
      "every batch version queryable, serve grows with the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_stream"
    // bootstrap: an empty snapshot under a NEGATIVE version id so
    // checkpointed batch ids (>= 0) never collide
    EpochTable.refresh(spark, path, mkTyped(Seq.empty[Long]),
      version = -1L)
    val src = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamRunner.tableIngestEpochStream(path,
      src.toDF().toDF("event_id", "etype", "uid"))
    try {
      src.addData((1L, "a", 10L), (2L, "b", 20L))
      q.processAllAvailable()
      assert(EpochTable.serve(spark, path).count() === 2L)
      src.addData((3L, "c", 30L))
      q.processAllAvailable()
      assert(EpochTable.serve(spark, path).count() === 3L)
      // batch 0's version serves exactly the first micro-batch
      assert(EpochTable.dataForVersion(spark, path, 0L).get.count() === 2L)
      assert(EpochTable.versions(spark, path)
        .orderBy("version").collect().map(_.getAs[Long]("version"))
        .toSeq === Seq(-1L, 0L, 1L))
    } finally q.stop()
  }

  test("clustered compaction: files own disjoint key intervals (the " +
      "footer-stats pruning property), rows byte-identical to the " +
      "unclustered fold") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_cluster"
    EpochTable.refresh(spark, path,
      mkTyped(scala.util.Random.shuffle((1L to 4000L).toList)),
      version = 0L)
    EpochTable.compact(spark, path, nFiles = 4,
      clusterBy = Seq("event_id"))
    val served = EpochTable.serve(spark, path)
    assert(served.count() === 4000L)
    // per-file [min,max] intervals of the cluster key must be disjoint
    val ranges = served
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"overlapping file intervals: $ranges")
    }
    // a point lookup is pruned to ONE file by the parquet footer stats
    val one = EpochTable.serve(spark, path)
      .where(col("event_id") === 1234L)
      .withColumn("f", input_file_name())
    assert(one.select("f").distinct().count() === 1L)
  }

  test("tableCdcEpochStream: one merge version per micro-batch, " +
      "in-batch changes fold latest-wins on the CDC position, " +
      "updates replace and inserts grow the served table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_cdc"
    EpochTable.refresh(spark, path, mkTyped(1L to 20L), version = -1L)
    val src = MemoryStream[(Long, String, Long, Long)]
    val q = graft.streaming.StreamRunner.tableCdcEpochStream(path,
      src.toDF().toDF("event_id", "etype", "uid", "seq"),
      keys = Seq("event_id"), orderCol = Some("seq"))
    try {
      // two changes for key 5 in ONE batch: seq decides the survivor
      src.addData((5L, "stale", 0L, 1L), (5L, "fresh", 50L, 2L),
        (21L, "new", 210L, 1L))
      q.processAllAvailable()
      val served = EpochTable.serve(spark, path)
      assert(served.count() === 21L)
      assert(served.where(col("event_id") === 5L).head()
        .getAs[String]("etype") === "fresh")
      // the CDC position column is applied, not stored
      assert(!served.columns.contains("seq"))
      src.addData((5L, "fresher", 51L, 3L))
      q.processAllAvailable()
      assert(EpochTable.serve(spark, path)
        .where(col("event_id") === 5L).head()
        .getAs[String]("etype") === "fresher")
      // each micro-batch is a queryable merge version
      assert(EpochTable.versions(spark, path)
        .orderBy("version").collect().map(_.getAs[Long]("version"))
        .toSeq === Seq(-1L, 0L, 1L))
    } finally q.stop()
  }

  test("tombstones match NULL-bearing rows (null-safe anti-join): a " +
      "doomed row with NULL in a value column is removed, an IS NULL " +
      "takedown removes exactly the null rows, and the plan stays a " +
      "broadcast hash join") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_nulltomb"
    // etype NULL on the 0-mod-3 rows, uid NULL on row 7
    val base = (1L to 30L).map(i => (i,
      if (i % 3 == 0) null else s"v$i",
      if (i == 7L) None else Some(i * 10L)))
      .toDF("event_id", "etype", "uid")
    EpochTable.refresh(spark, path, base, version = 0L)
    // full-row tombstones (the SQL DELETE shape) carrying NULLs: rows
    // 3 (null etype) and 7 (null uid) must die despite the NULLs
    EpochTable.delete(spark,
      base.where(col("event_id").isin(3L, 7L)), path, batchId = 1L)
    val served = EpochTable.serve(spark, path)
    assert(served.count() === 28L)
    assert(served.where(col("event_id").isin(3L, 7L)).isEmpty)
    val plan = served.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"not a BHJ:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n$plan")
    // replaying a NULL-bearing tombstone batch stays a no-op commit
    // (null-safe dedup): no fresh rows → no new epoch
    val before = Epoch.resolve(spark, path).get.epoch
    EpochTable.delete(spark,
      base.where(col("event_id").isin(3L, 7L)), path, batchId = 3L)
    assert(Epoch.resolve(spark, path).get.epoch === before)
    // and the fold physically drops them, serving unchanged
    EpochTable.compact(spark, path)
    assert(EpochTable.serve(spark, path).count() === 28L)
    // a NULL KEY takedown (tombstone batches share one schema per
    // layout): every null-etype row dies on a single null key
    val path2 = s"${graft.GraftSession.scratchDir}/table_epoch_nullkey"
    EpochTable.refresh(spark, path2, base, version = 0L)
    EpochTable.delete(spark,
      base.where(col("etype").isNull).select("etype"), path2,
      batchId = 1L)
    assert(EpochTable.serve(spark, path2).count() === 20L)
    assert(EpochTable.serve(spark, path2)
      .where(col("etype").isNull).isEmpty)
  }

  test("merge's algebraic load_records equals the full recount across " +
      "duplicates, prior merges, and tombstones") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_mergecnt"
    // base carries a DUPLICATE key (id 5 twice)
    val base = mkTyped(1L to 20L)
      .unionByName(mkTyped(Seq(5L)).withColumn("etype", lit("dup")))
    EpochTable.refresh(spark, path, base, version = 0L)
    // a takedown: id 9 tombstoned
    EpochTable.delete(spark, Seq(9L).toDF("event_id"), path, batchId = 1L)
    // merge 1: replaces the duplicated key (both rows die → −1),
    // inserts 21 (+1), re-merges the tombstoned 9 (suppressed → +0)
    val loaded1 = EpochTable.merge(spark, path,
      mkTyped(Seq(5L, 9L, 21L)), version = 1L, keys = Seq("event_id"))
    assert(loaded1 === EpochTable.serve(spark, path).count())
    // merge 2 on top of merge 1 (newest-gen-wins shadowing live):
    // replaces 5 again (+0) and inserts 22 (+1)
    val loaded2 = EpochTable.merge(spark, path,
      mkTyped(Seq(5L, 22L)), version = 2L, keys = Seq("event_id"),
      fullRecount = false)
    assert(loaded2 === EpochTable.serve(spark, path).count())
    // the opt-in full recount lands on the same number
    val loaded3 = EpochTable.merge(spark, path,
      mkTyped(Seq(23L)), version = 3L, keys = Seq("event_id"),
      fullRecount = true)
    assert(loaded3 === loaded2 + 1L)
    assert(EpochTable.versions(spark, path)
      .where(col("version") === 2L).head()
      .getAs[Long]("load_records") === loaded2)
  }

  test("batch changes face: insert/upsert/delete pieces with correct " +
      "ops, folds skipped, rewrites refuse; before-images resolve " +
      "from the previous pinned version (inserts NULL)") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_chg"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(11L to 14L),
      version = 1L)
    EpochTable.merge(spark, path, mkTyped(Seq(5L, 21L))
      .withColumn("etype", lit("up")), version = 2L,
      keys = Seq("event_id"))
    EpochTable.delete(spark, Seq(3L, 11L).toDF("event_id"), path,
      batchId = 1L)
    EpochTable.compact(spark, path)
    EpochTable.refreshDelta(spark, path, mkTyped(22L to 23L),
      version = 3L)
    val head = Epoch.resolve(spark, path).get.epoch
    val chg = EpochTable.changes(spark, path, 0L, head)
    def ids(op: String) = chg.where(col("_op") === op)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("insert") === Seq(11L, 12L, 13L, 14L, 22L, 23L))
    assert(ids("upsert") === Seq(5L, 21L))
    assert(ids("delete") === Seq(3L, 11L))
    // delete rows NULL-pad the columns the tombstone lacks
    assert(chg.where(col("_op") === "delete" && col("etype").isNotNull)
      .isEmpty)
    // before-images: replaced key 5 sees its v0 row, fresh key 21 and
    // plain inserts see NULL, deleted keys see the pre-delete face
    val wb = EpochTable.changesWithBefore(spark, path, 0L, head,
      keys = Seq("event_id"))
    assert(wb.where(col("event_id") === 5L && col("_op") === "upsert")
      .head().getAs[String]("before_etype") === "v5")
    assert(wb.where(col("event_id") === 21L).head()
      .getAs[String]("before_etype") === null)
    assert(wb.where(col("event_id") === 12L && col("_op") === "insert")
      .head().getAs[String]("before_etype") === null)
    assert(wb.where(col("event_id") === 3L && col("_op") === "delete")
      .head().getAs[String]("before_etype") === "v3")
    assert(wb.where(col("event_id") === 11L && col("_op") === "delete")
      .head().getAs[String]("before_etype") === "v11")
    // a full refresh inside the range refuses — no change log exists
    EpochTable.refresh(spark, path, mkTyped(1L to 3L), version = 9L)
    val e = intercept[Exception] {
      EpochTable.changes(spark, path, 0L,
        Epoch.resolve(spark, path).get.epoch).count()
    }
    assert(e.getMessage.contains("no change log"), e.getMessage)
  }

  test("staging orphans are observable and reapable: a crashed " +
      "statement's _stage_ dir reports with age and bytes, an aged " +
      "reap removes it, a young one survives") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_stage"
    EpochTable.refresh(spark, path, mkTyped(1L to 5L), version = 0L)
    mkTyped(1L to 5L).write.mode("overwrite")
      .parquet(s"$path/_stage_crashed")
    val o = Epoch.orphans(spark, path)
    assert(o.stages.map(_._1) === Seq("_stage_crashed"))
    assert(o.stagingBytes > 0L)
    // young stages survive a conservative reap...
    assert(Epoch.reapStages(spark, path,
      olderThanMs = 3600_000L).isEmpty)
    // ...an aged reap removes them
    assert(Epoch.reapStages(spark, path, olderThanMs = 0L) ===
      Seq("_stage_crashed"))
    assert(Epoch.orphans(spark, path).stages.isEmpty)
    assert(EpochTable.serve(spark, path).count() === 5L)
  }

  test("Pipeline.updateTableEpoch: clean → load → epoch commit with " +
      "count-verified metrics riding the manifest") {
    import graft.schemas.Schemas
    val dir = java.nio.file.Files.createTempDirectory("tsv")
    val tsv = dir.resolve("LOOKUP_CODES_CD.TSV")
    java.nio.file.Files.write(tsv,
      ("CODE_TYPE\tCODE_ID\tCODE_DESC\n1\t100\tIndividual\n" +
        "1\t200\tCommittee\nbroken row\n2\t300\tOther\n").getBytes("UTF-8"))
    val root = s"${graft.GraftSession.scratchDir}/table_epoch_pipe"
    val r = graft.Pipeline.updateTableEpoch(spark, Schemas.lookupCodesCd,
      tsv.toString, root, version = 0L)
    assert(r.metrics.consistent, r.metrics.toString)
    assert(r.metrics.errorRecords === 1L)
    assert(r.metrics.loadRecords === 3L)
    val v = EpochTable.versions(spark,
      s"$root/${Schemas.lookupCodesCd.name}").collect()
    assert(v.length === 1 && v(0).getAs[Boolean]("consistent"))
    assert(v(0).getAs[Long]("error_records") === 1L)
  }

  test("algebraic merge count survives delete→compact→merge: compact " +
      "empties the Tomb component but the carried meta row still " +
      "counts the deleted rows — the ledger check alone must force " +
      "the recount") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_dcm"
    EpochTable.refresh(spark, path, mkTyped(1L to 20L), version = 0L)
    EpochTable.delete(spark, Seq(3L, 4L).toDF("event_id"), path,
      batchId = 1L)
    EpochTable.compact(spark, path) // Tomb empty; meta still says 20
    // 18 served − 1 replaced (5) + 2 batch = 19, NOT 21 (the stale
    // algebraic base would count the two deleted rows back in)
    val loaded = EpochTable.merge(spark, path, mkTyped(Seq(5L, 21L)),
      version = 1L, keys = Seq("event_id"))
    assert(loaded === 19L)
    assert(loaded === EpochTable.serve(spark, path).count())
    // the NEXT merge's algebraic path rides the now-correct meta row
    val loaded2 = EpochTable.merge(spark, path, mkTyped(Seq(22L)),
      version = 2L, keys = Seq("event_id"))
    assert(loaded2 === 20L)
    assert(loaded2 === EpochTable.serve(spark, path).count())
    // ... and $versions serves the corrected counts
    assert(EpochTable.versions(spark, path)
      .where(col("version") === 1L).head()
      .getAs[Long]("load_records") === 19L)
  }

  test("legacy field-id synthesis refuses a 32-bit hash collision " +
      "instead of silently aliasing two columns to one id") {
    // brute-force two distinct names whose synthesized ids collide
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    var pair: Option[(String, String)] = None
    var i = 0
    while (pair.isEmpty && i < 2000000) {
      val n = s"c$i"
      val id = math.abs(
        scala.util.hashing.MurmurHash3.stringHash(n).toLong)
      seen.get(id) match {
        case Some(prev) => pair = Some((prev, n))
        case None => seen(id) = n
      }
      i += 1
    }
    assert(pair.nonEmpty, "no murmur collision within 2M candidates")
    val (a, b) = pair.get
    // a LEGACY layout (no fields component), committed by hand
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_synthcol"
    Seq((1L, 2L)).toDF(a, b).write.mode("overwrite")
      .parquet(s"$path/g0/data")
    Epoch.commit(spark, path, Epoch.Manifest(0L,
      Map("data" -> Seq("g0/data")), Seq("ver_0")))
    val e = intercept[IllegalArgumentException] {
      EpochTable.serveMapped(spark, path).collect()
    }
    assert(e.getMessage.contains("collided"), e.getMessage)
  }

  test("commitRewrite carries a pending divergence marker forward: a " +
      "programmatic rewrite mid-rename keeps the table routed to the " +
      "mapped face (display names, not raw physical ones)") {
    val path = s"${graft.GraftSession.scratchDir}/table_epoch_rwev"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.renameColumn(spark, path, "etype", "category")
    val m = Epoch.resolve(spark, path).get
    assert(EpochTable.isDiverged(m))
    // a whole-table rewrite under the PHYSICAL names (what the CoW
    // path stages), committed programmatically
    val stage = s"$path/_stage_t"
    spark.read.parquet(EpochTable.scanDataDirs(path, m): _*)
      .write.parquet(stage)
    Epoch.occ(spark, path) {
      EpochTable.commitRewrite(spark, path, m,
        EpochTable.dataFiles(spark, path, m)
          .map(_.getPath.toUri.getPath).toSet, stage)
    }
    val after = Epoch.resolve(spark, path).get
    assert(EpochTable.isDiverged(after),
      "rewrite dropped the Evolve marker — the catalog would serve " +
        "raw physical column names mid-divergence")
    assert(EpochTable.serveMapped(spark, path).columns
      .contains("category"))
    // the convergence fold still clears it
    EpochTable.compact(spark, path)
    assert(!EpochTable.isDiverged(Epoch.resolve(spark, path).get))
  }
}
