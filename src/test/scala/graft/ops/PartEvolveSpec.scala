package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Partition-spec EVOLUTION (round-19 verdict "next" #5): the grain
  * of a partitioned table changes in ONE metadata commit — retained
  * entries keep serving under the grain they were written with, new
  * deltas land under the new grain, folds regroup exactly the
  * entries they touch to the current grain, and the planner's entry
  * pruning interprets each dir value under whichever historical
  * grains parse it. A table born month-grained moves to day grain
  * without rewriting a byte of history. */
class PartEvolveSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/pevcat"

  private def registered(): Unit =
    graft.sources.EpochTableCatalog.register(spark, "gpev", root)

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")

  /** 3 months × `n/3` rows, ids 1..n. */
  private def mkRows(ids: Seq[Long]) =
    ids.map(i => (i, ts(f"2024-${(i % 3) + 1}%02d-${(i % 28) + 1}%02d"),
      s"v$i")).toDF("id", "dt", "v")

  test("month→day evolution is one metadata commit: old entries " +
      "serve as written, deltas land day-grained, the union is " +
      "exact, and time travel to the pre-evolution version holds") {
    val path = s"$root/base"
    EpochTable.refreshPartitioned(spark, path,
      mkRows(2L to 180L by 2L), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    val dataBefore = Epoch.resolve(spark, path).get.components("data")
    EpochTable.evolvePartitionSpec(spark, path,
      EpochTable.PartSpec("dt", "day"))
    val m1 = Epoch.resolve(spark, path).get
    // zero data movement; the history records both grains
    assert(m1.components("data") === dataBefore)
    assert(EpochTable.partSpecHistoryOf(spark, path, m1) ===
      Seq(EpochTable.PartSpec("dt", "month"),
        EpochTable.PartSpec("dt", "day")))
    assert(EpochTable.partSpecOf(spark, path, m1) ===
      Some(EpochTable.PartSpec("dt", "day")))
    // the delta lands DAY-grained beside the month dirs
    EpochTable.refreshDelta(spark, path, mkRows(1L to 179L by 2L),
      version = 1L)
    val m2 = Epoch.resolve(spark, path).get
    val fresh = m2.components("data").filterNot(dataBefore.contains)
    assert(fresh.nonEmpty && fresh.forall(e =>
      "_p=\\d{4}-\\d{2}-\\d{2}$".r.findFirstIn(e).isDefined),
      fresh.toString)
    assert(dataBefore.forall(m2.components("data").contains))
    // both grains serve as one table
    val served = EpochTable.serve(spark, path)
    assert(served.count() === 180L)
    assert(served.orderBy("id").collect().toSeq ===
      mkRows(1L to 180L).orderBy("id").collect().toSeq)
    // the pre-evolution version still serves month-grained
    assert(EpochTable.dataForVersion(spark, path, 0L).get.count() === 90L)
  }

  test("a DELETE spanning both grains folds exactly the touched " +
      "entries — each regrouped to the CURRENT grain — while " +
      "untouched old-grain months carry byte-identical") {
    registered()
    val path = s"$root/xfold"
    // months 01..03 under month grain (even ids), then day-grain
    // delta (odd ids); junk planted in BOTH: one old-grain month
    // (2024-02) and one new-grain day (2024-03-15)
    val junkOld = (1000L to 1009L).map(i =>
      (i, ts("2024-02-20"), "JUNK")).toDF("id", "dt", "v")
    val junkNew = (2000L to 2009L).map(i =>
      (i, ts("2024-03-15"), "JUNK")).toDF("id", "dt", "v")
    EpochTable.refreshPartitioned(spark, path,
      mkRows(2L to 180L by 2L).unionByName(junkOld), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    EpochTable.evolvePartitionSpec(spark, path,
      EpochTable.PartSpec("dt", "day"))
    EpochTable.refreshDelta(spark, path,
      mkRows(1L to 179L by 2L).unionByName(junkNew), version = 1L)
    val before = Epoch.resolve(spark, path).get
    def isMonthEntry(e: String) =
      "_p=\\d{4}-\\d{2}$".r.findFirstIn(e).isDefined
    val monthEntries = before.components("data").filter(isMonthEntry)
    spark.sql("DELETE FROM gpev.xfold WHERE v = 'JUNK'")
    val after = Epoch.resolve(spark, path).get
    val carried = after.components("data")
      .intersect(before.components("data"))
    // month 2024-01 hosts no doomed row under EITHER grain's
    // derivation → carried by reference. Months 02 and 03 both fold:
    // 02 holds junkOld, and the day-grain tombstone 2024-03-15 could
    // live in the 03 month entry (the fold can't know it doesn't
    // without reading — conservative, never wrong).
    assert(monthEntries.filter(_.contains("_p=2024-01"))
      .forall(carried.contains), s"month 01 rewrote: $carried")
    assert(!after.components("data").exists(e =>
      isMonthEntry(e) &&
        (e.contains("_p=2024-02") || e.contains("_p=2024-03"))),
      after.components("data").toString)
    // untouched DAY entries carry; the junk day folds
    val dayCarried = carried.filterNot(isMonthEntry)
    assert(dayCarried.nonEmpty)
    assert(!after.components("data").exists(e =>
      before.components("data").contains(e) &&
        e.contains("_p=2024-03-15")),
      after.components("data").toString)
    // every folded entry regrouped to the CURRENT (day) grain
    assert(after.components("data")
      .filterNot(before.components("data").contains)
      .forall(e => !isMonthEntry(e)),
      after.components("data").toString)
    // the doomed rows are gone — BOTH grains' junk (an under-derived
    // cross-grain touched set would leave survivors)
    val served = spark.sql("SELECT * FROM gpev.xfold")
    assert(served.where(col("v") === "JUNK").isEmpty)
    assert(served.count() === 180L)
    assert(after.components.getOrElse("tombstones", Seq.empty).isEmpty)
  }

  test("mixed-grain planning bounds: a query inside an old-grain " +
      "month reads only that month's entry; one inside a new-grain " +
      "day reads only day entries") {
    registered()
    val path = s"$root/plan"
    EpochTable.refreshPartitioned(spark, path,
      mkRows(2L to 300L by 2L), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    EpochTable.evolvePartitionSpec(spark, path,
      EpochTable.PartSpec("dt", "day"))
    EpochTable.refreshDelta(spark, path, mkRows(1L to 299L by 2L),
      version = 1L)
    def planned(sql: String): Seq[String] = {
      val q = spark.sql(sql)
      q.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(qs.plan)
          case other => other.children.flatMap(walk) ++ (other match {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
              Seq(b)
            case _ => Seq.empty
          })
        }
      walk(q.queryExecution.executedPlan)
        .flatMap(_.inputPartitions).flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString).toSeq
          case _ => Seq.empty[String]
        }.distinct
    }
    // a whole old-grain month: only its month dir + that month's days
    val feb = planned("SELECT * FROM gpev.plan " +
      "WHERE dt >= TIMESTAMP '2024-02-01 00:00:00' " +
      "AND dt < TIMESTAMP '2024-03-01 00:00:00'")
    assert(feb.nonEmpty && feb.forall(f =>
      f.contains("_p=2024-02")), feb.toString)
    // a single new-grain day: its day dir + its month's dir only
    val day = planned("SELECT * FROM gpev.plan " +
      "WHERE dt >= TIMESTAMP '2024-03-04 00:00:00' " +
      "AND dt < TIMESTAMP '2024-03-05 00:00:00'")
    assert(day.nonEmpty && day.forall(f =>
      f.contains("_p=2024-03-04") || f.contains("_p=2024-03/")),
      day.toString)
  }

  test("guards: evolving an unpartitioned table refuses; changing " +
      "the partition COLUMN refuses; re-declaring the current spec " +
      "is a no-op; a full refresh resets the history") {
    val flat = s"$root/flat"
    EpochTable.refresh(spark, flat, mkRows(1L to 10L), version = 0L)
    val e1 = intercept[IllegalArgumentException] {
      EpochTable.evolvePartitionSpec(spark, flat,
        EpochTable.PartSpec("dt", "day"))
    }
    assert(e1.getMessage.contains("not partitioned"), e1.getMessage)
    val path = s"$root/guard"
    EpochTable.refreshPartitioned(spark, path, mkRows(1L to 30L),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    val e2 = intercept[IllegalArgumentException] {
      EpochTable.evolvePartitionSpec(spark, path,
        EpochTable.PartSpec("v", "identity"))
    }
    assert(e2.getMessage.contains("cannot change"), e2.getMessage)
    val head = Epoch.resolve(spark, path).get.epoch
    EpochTable.evolvePartitionSpec(spark, path,
      EpochTable.PartSpec("dt", "month"))
    assert(Epoch.resolve(spark, path).get.epoch === head) // no-op
    EpochTable.evolvePartitionSpec(spark, path,
      EpochTable.PartSpec("dt", "day"))
    assert(EpochTable.partSpecHistoryOf(spark, path,
      Epoch.resolve(spark, path).get).size === 2)
    // a full reload rewrites everything — history resets to one spec
    EpochTable.refreshPartitioned(spark, path, mkRows(1L to 30L),
      version = 1L, EpochTable.PartSpec("dt", "month"))
    assert(EpochTable.partSpecHistoryOf(spark, path,
      Epoch.resolve(spark, path).get) ===
      Seq(EpochTable.PartSpec("dt", "month")))
  }
}
