package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Field-id schema evolution on the table tier: rename/drop are pure
  * metadata commits, old versions resolve under the current names by
  * field id, incompatible type changes refuse loudly, and ingestion
  * is fenced until a fold converges physical names to display names. */
class EpochFieldsSpec extends SparkTestBase {

  import spark.implicits._

  private def mkTyped(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i", i * 10L)).toDF("event_id", "etype", "uid")

  test("rename is one metadata commit: zero data movement, the served " +
      "mapped face flips immediately, every retained version answers " +
      "to the NEW name by field id") {
    val path = s"${graft.GraftSession.scratchDir}/fields_rename"
    EpochTable.refresh(spark, path, mkTyped(1L to 20L), version = 0L)
    val dataBefore = Epoch.resolve(spark, path).get.components("data")
    EpochTable.renameColumn(spark, path, "etype", "kindof")
    val m1 = Epoch.resolve(spark, path).get
    // the data dirs are untouched — the commit moved only metadata
    assert(m1.components("data") === dataBefore)
    val served = EpochTable.serveMapped(spark, path)
    assert(served.columns.toSeq ===
      Seq("event_id", "kindof", "uid"))
    assert(served.where(col("event_id") === 3L).head()
      .getAs[String]("kindof") === "v3")
    // the PRE-rename version answers to the new name too
    val v0 = EpochTable.dataForVersionMapped(spark, path, 0L).get
    assert(v0.columns.toSeq === Seq("event_id", "kindof", "uid"))
    assert(v0.count() === 20L)
    // the raw physical face still carries the old name until a fold
    assert(EpochTable.serve(spark, path).columns.contains("etype"))
  }

  test("ingestion is fenced while display ≠ physical; compact " +
      "converges the names and reopens it; the folded files carry " +
      "the display names physically") {
    val path = s"${graft.GraftSession.scratchDir}/fields_fence"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.renameColumn(spark, path, "etype", "label")
    val e = intercept[IllegalArgumentException] {
      EpochTable.refreshDelta(spark, path,
        mkTyped(11L to 12L).withColumnRenamed("etype", "label"),
        version = 1L)
    }
    assert(e.getMessage.contains("pending physical convergence"),
      e.getMessage)
    intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path,
        mkTyped(Seq(1L)).withColumnRenamed("etype", "label"),
        version = 1L, keys = Seq("event_id"))
    }
    EpochTable.compact(spark, path)
    // physical = display now: the raw face serves the new name and
    // deltas land again (under the new name)
    assert(EpochTable.serve(spark, path).columns.toSeq ===
      Seq("event_id", "label", "uid"))
    EpochTable.refreshDelta(spark, path,
      mkTyped(11L to 12L).withColumnRenamed("etype", "label"),
      version = 1L)
    assert(EpochTable.serveMapped(spark, path).count() === 12L)
  }

  test("a full refresh matching a renamed display name keeps the " +
      "field id; an in-place TYPE change refuses loudly; rename " +
      "collisions and unknown columns refuse") {
    val path = s"${graft.GraftSession.scratchDir}/fields_types"
    EpochTable.refresh(spark, path, mkTyped(1L to 8L), version = 0L)
    EpochTable.renameColumn(spark, path, "etype", "label")
    // full reload under the new names — same ids, files converge
    EpochTable.refresh(spark, path,
      mkTyped(1L to 9L).withColumnRenamed("etype", "label"),
      version = 1L)
    // version 0 (physical etype) still answers to label
    val v0 = EpochTable.dataForVersionMapped(spark, path, 0L).get
    assert(v0.columns.contains("label") && v0.count() === 8L)
    // retype label: string → bigint refuses naming the remedy
    val e = intercept[IllegalArgumentException] {
      EpochTable.refresh(spark, path,
        (1L to 9L).map(i => (i, i, i * 10L))
          .toDF("event_id", "label", "uid"),
        version = 2L)
    }
    assert(e.getMessage.contains("changes type"), e.getMessage)
    intercept[IllegalArgumentException] {
      EpochTable.renameColumn(spark, path, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      EpochTable.renameColumn(spark, path, "label", "uid")
    }
  }

  test("drop is a mapping tombstone: the column leaves every mapped " +
      "face (old versions included) with zero data movement; the " +
      "fold reaps the bytes; re-adding the name mints a NEW id") {
    val path = s"${graft.GraftSession.scratchDir}/fields_drop"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    EpochTable.dropColumn(spark, path, "uid")
    assert(EpochTable.serveMapped(spark, path).columns.toSeq ===
      Seq("event_id", "etype"))
    assert(EpochTable.dataForVersionMapped(spark, path, 0L).get
      .columns.toSeq === Seq("event_id", "etype"))
    // the physical bytes go at the fold
    EpochTable.compact(spark, path)
    assert(EpochTable.serve(spark, path).columns.toSeq ===
      Seq("event_id", "etype"))
    // a refresh re-adding `uid` matches no live display name → a new
    // field id, so version 0's dropped uid never bleeds back in
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 1L)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0 = EpochTable.dataForVersionMapped(spark, path, 0L).get
    // version 0 under the current schema: uid exists again (new id)
    // but version 0's files never carried THAT id → typed NULLs
    assert(v0.columns.toSeq === Seq("event_id", "etype", "uid"))
    assert(v0.where(col("uid").isNotNull).count() === 0L)
    assert(f.exists(new org.apache.hadoop.fs.Path(path)))
  }

  test("ADD COLUMN refuses while a dropped or renamed field still " +
      "owns the physical name — the fold retires it and the re-add " +
      "then mints a fresh id (no resurrection of dead bytes)") {
    val path = s"${graft.GraftSession.scratchDir}/fields_readd"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    // drop uid: the entry is a tombstone but phys `uid` is still in
    // every file — a same-name ADD would resolve to the dead bytes
    EpochTable.dropColumn(spark, path, "uid")
    val e1 = intercept[IllegalArgumentException] {
      EpochTable.addColumn(spark, path, "uid",
        org.apache.spark.sql.types.LongType)
    }
    assert(e1.getMessage.contains("still owned"), e1.getMessage)
    // rename etype→label: the live entry keeps phys `etype` until the
    // fold — ADD COLUMN etype would put two live fields on one phys
    EpochTable.renameColumn(spark, path, "etype", "label")
    val e2 = intercept[IllegalArgumentException] {
      EpochTable.addColumn(spark, path, "etype",
        org.apache.spark.sql.types.StringType)
    }
    assert(e2.getMessage.contains("still owned"), e2.getMessage)
    // the fold reaps the dropped bytes and converges the rename —
    // both names are free again, and the re-added uid serves typed
    // NULLs (a fresh id, never version 0's values)
    EpochTable.compact(spark, path)
    EpochTable.addColumn(spark, path, "uid",
      org.apache.spark.sql.types.LongType)
    EpochTable.addColumn(spark, path, "etype",
      org.apache.spark.sql.types.StringType)
    val served = EpochTable.serveMapped(spark, path)
    assert(served.columns.toSeq ===
      Seq("event_id", "label", "uid", "etype"))
    assert(served.where(col("uid").isNotNull ||
      col("etype").isNotNull).count() === 0L)
  }

  test("a layout deleted and recreated at the same path serves the " +
      "NEW fields component — the cache keys on the component's file " +
      "fingerprint, never on path alone") {
    val path = s"${graft.GraftSession.scratchDir}/fields_recreate"
    EpochTable.refresh(spark, path, mkTyped(1L to 5L), version = 0L)
    // populate the cache through a mapped read
    assert(EpochTable.serveMapped(spark, path).columns.toSeq ===
      Seq("event_id", "etype", "uid"))
    // FS-level recreation (out-of-band cleanup): same path, same
    // generation numbers, DIFFERENT schema
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    Thread.sleep(20) // ensure a distinct mtime on the recreated dirs
    EpochTable.refresh(spark, path,
      (1L to 5L).map(i => (i, i * 2.5)).toDF("row_id", "score"),
      version = 0L)
    assert(EpochTable.serveMapped(spark, path).columns.toSeq ===
      Seq("row_id", "score"))
  }

  test("a mid-stream RETYPE refuses at the stream-delta commit: the " +
      "guard compares types, not just names") {
    val path = s"${graft.GraftSession.scratchDir}/fields_stw_retype"
    EpochTable.refresh(spark, path, mkTyped(1L to 10L), version = 0L)
    // stage a batch whose columns match by NAME but uid is retyped
    val stage = s"$path/_stage_retype"
    (11L to 12L).map(i => (i, s"v$i", i * 1.5))
      .toDF("event_id", "etype", "uid")
      .write.mode("overwrite").parquet(stage)
    val e = intercept[IllegalArgumentException] {
      EpochTable.commitStreamDelta(spark, path, stage, "stw_retype_0")
    }
    assert(e.getMessage.contains("names or types differ"), e.getMessage)
    // same shape commits fine
    val stage2 = s"$path/_stage_ok"
    mkTyped(11L to 12L).write.mode("overwrite").parquet(stage2)
    EpochTable.commitStreamDelta(spark, path, stage2, "stw_ok_0")
    assert(EpochTable.serve(spark, path).count() === 12L)
  }
}
