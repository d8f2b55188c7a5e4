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
}
