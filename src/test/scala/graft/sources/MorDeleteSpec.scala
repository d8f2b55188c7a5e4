package graft.sources

import graft.SparkTestBase
import graft.ops.{Epoch, EpochTable}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ row-level deletes (round-19 verdict "next" #2):
  * with `graft.mode = mor`, SQL DELETE commits ONLY the tombstone
  * component — zero data files rewritten, O(|doomed|) bytes — and the
  * SQL serve path applies the tombstones per row at read (widened
  * projection, canonical byte-equality, null-safe) until the
  * maintenance fold reaps them. The steady takedown drip at 100 TB
  * stops rewriting hot files; correctness never depends on the fold
  * having run. */
class MorDeleteSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/morcat"

  private def registered(): Unit =
    EpochTableCatalog.register(spark, "gmor", root)

  private def mkTyped(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i",
      if (i % 5 == 0) None else Some(i * 10L)))
      .toDF("event_id", "etype", "uid")

  test("a 1-row DELETE commits O(1): the manifest's data entries are " +
      "UNCHANGED (zero files rewritten), only a tombstone component " +
      "lands — and the SQL read hides exactly the doomed row") {
    registered()
    val path = s"$root/wamp"
    EpochTable.refresh(spark, path, mkTyped(1L to 4000L), version = 0L)
    EpochTable.compact(spark, path, nFiles = 8,
      clusterBy = Seq("event_id"))
    spark.sql(
      "ALTER TABLE gmor.wamp SET TBLPROPERTIES ('graft.mode' = 'mor')")
    val before = Epoch.resolve(spark, path).get
    val beforeFiles = EpochTable.dataFiles(spark, path, before)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    spark.sql("DELETE FROM gmor.wamp WHERE event_id = 1234")
    val after = Epoch.resolve(spark, path).get
    // zero write amplification: the data component is IDENTICAL (by
    // entry and by bytes); the only new component is the tombstone
    assert(after.components("data") === before.components("data"))
    val afterFiles = EpochTable.dataFiles(spark, path, after)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    assert(afterFiles === beforeFiles)
    assert(after.components.getOrElse("tombstones", Seq.empty).nonEmpty)
    // the SQL face serves correct rows with the tombstone PENDING
    val served = spark.sql("SELECT * FROM gmor.wamp")
    assert(served.count() === 3999L)
    assert(served.where(col("event_id") === 1234L).isEmpty)
    // column-pruned reads widen internally but output only what was
    // asked; pushed-filter pruning still fires under MoR
    val narrow = spark.sql(
      "SELECT uid FROM gmor.wamp WHERE event_id BETWEEN 1230 AND 1240")
    assert(narrow.columns.toSeq === Seq("uid"))
    assert(narrow.count() === 10L)
    // aggregates can not answer from footers while tombstones pend
    assert(spark.sql("SELECT COUNT(*) AS n FROM gmor.wamp")
      .head().getLong(0) === 3999L)
    assert(spark.sql("SELECT MAX(event_id) AS m FROM gmor.wamp " +
      "WHERE event_id <= 1234").head().getLong(0) === 1233L)
  }

  test("NULL-bearing rows die under MoR too (null-safe byte match); " +
      "repeated deletes accumulate; the answer hash-equals the CoW " +
      "twin's") {
    registered()
    val path = s"$root/nulls"
    val cow = s"$root/nulls_cow"
    EpochTable.refresh(spark, path, mkTyped(1L to 500L), version = 0L)
    EpochTable.refresh(spark, cow, mkTyped(1L to 500L), version = 0L)
    spark.sql(
      "ALTER TABLE gmor.nulls SET TBLPROPERTIES ('graft.mode' = 'mor')")
    // uid IS NULL rows (every 5th) have NULL in a match column
    spark.sql("DELETE FROM gmor.nulls WHERE uid IS NULL")
    spark.sql("DELETE FROM gmor.nulls WHERE event_id = 7")
    spark.sql("DELETE FROM gmor.nulls_cow WHERE uid IS NULL")
    spark.sql("DELETE FROM gmor.nulls_cow WHERE event_id = 7")
    val mor = spark.sql("SELECT * FROM gmor.nulls ORDER BY event_id")
      .collect().toSeq
    val cowRows = spark.sql(
      "SELECT * FROM gmor.nulls_cow ORDER BY event_id").collect().toSeq
    assert(mor === cowRows)
    assert(mor.size === 399)
    // the MoR table still carries pending tombstones (no fold ran)
    assert(Epoch.resolve(spark, path).get
      .components.getOrElse("tombstones", Seq.empty).nonEmpty)
  }

  test("$changes still streams the delete (no fold hides it); the " +
      "maintenance fold reaps the tombstones, restores the folded " +
      "gate, and serving is unchanged") {
    registered()
    val path = s"$root/feed"
    EpochTable.refresh(spark, path, mkTyped(1L to 100L), version = 0L)
    spark.sql(
      "ALTER TABLE gmor.feed SET TBLPROPERTIES ('graft.mode' = 'mor')")
    spark.sql("DELETE FROM gmor.feed WHERE event_id = 42")
    val changes = spark.sql(
      "SELECT _op, event_id FROM gmor.`feed$changes`")
    assert(changes.where(col("_op") === "delete").count() === 1L)
    assert(changes.where(col("_op") === "delete")
      .head().getLong(1) === 42L)
    // the fold reaps: tombstones empty, rows physically gone,
    // serving identical before/after
    val servedBefore = spark.sql(
      "SELECT * FROM gmor.feed ORDER BY event_id").collect().toSeq
    spark.sql("CALL gmor.compact(`table` => 'feed')")
    val m = Epoch.resolve(spark, path).get
    assert(m.components.getOrElse("tombstones", Seq.empty).isEmpty)
    assert(spark.sql("SELECT * FROM gmor.feed ORDER BY event_id")
      .collect().toSeq === servedBefore)
    assert(servedBefore.size === 99)
  }

  test("row-level UPDATE refuses while MoR tombstones pend (compact " +
      "first); mode validation refuses junk; RemoveProperty flips " +
      "back to CoW folding") {
    registered()
    val path = s"$root/guard"
    EpochTable.refresh(spark, path, mkTyped(1L to 50L), version = 0L)
    val e0 = intercept[Exception] {
      spark.sql("ALTER TABLE gmor.guard " +
        "SET TBLPROPERTIES ('graft.mode' = 'sideways')")
    }
    assert(e0.getMessage.contains("mor or cow"), e0.getMessage)
    spark.sql(
      "ALTER TABLE gmor.guard SET TBLPROPERTIES ('graft.mode' = 'mor')")
    spark.sql("DELETE FROM gmor.guard WHERE event_id = 3")
    // the CoW rewrite scan would serve raw files (deleted rows
    // included) — it must refuse until the fold
    val e1 = intercept[Exception] {
      spark.sql("UPDATE gmor.guard SET etype = 'x' WHERE event_id = 5")
    }
    assert(e1.getMessage.contains("compact"), e1.getMessage)
    spark.sql("CALL gmor.compact(`table` => 'guard')")
    spark.sql("UPDATE gmor.guard SET etype = 'x' WHERE event_id = 5")
    // dropping the property restores copy-on-write DELETE (fold runs
    // inline again)
    spark.sql("ALTER TABLE gmor.guard UNSET TBLPROPERTIES ('graft.mode')")
    spark.sql("DELETE FROM gmor.guard WHERE event_id = 9")
    val m = Epoch.resolve(spark, path).get
    assert(m.components.getOrElse("tombstones", Seq.empty).isEmpty)
    assert(spark.sql("SELECT * FROM gmor.guard").count() === 48L)
    assert(spark.sql(
      "SELECT etype FROM gmor.guard WHERE event_id = 5")
      .head().getString(0) === "x")
  }
}
