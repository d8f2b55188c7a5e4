package graft.sources

import graft.SparkTestBase
import graft.ops.{Epoch, EpochTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Manifest-level per-file column stats → PLANNING-TIME file skipping
  * (round-18 verdict "next" #1): every table generation commits a
  * stats component (min/max/null-count/rows per file × column, written
  * in the same pass as the verify recount), and the SQL scan build
  * drops disproven files before the parquet relation exists — pruned
  * files are never listed into partitions and never footer-opened.
  * Conservativeness is the contract: a file with no entry, an unknown
  * predicate shape, or a cast-wrapped comparison prunes nothing. */
class StatsPruneSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/statscat"

  private def registered(): Unit =
    EpochTableCatalog.register(spark, "gstat", root)

  // every 5th uid NULL so null-count stats are exercised
  private def mkTyped(ids: Seq[Long]) =
    ids.map(i => (i, s"v$i",
      if (i % 5 == 0) None else Some(i * 10L)))
      .toDF("event_id", "etype", "uid")

  /** Distinct data files the plan's DSv2 scans actually planned —
    * AQE-aware (subquery scans included via the executed plan). */
  private def plannedFiles(df: DataFrame): Seq[String] = {
    df.collect()
    def walk(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case other =>
        other.children.flatMap(walk) ++ (other match {
          case b: BatchScanExec => Seq(b)
          case _ => Seq.empty
        })
    }
    walk(df.queryExecution.executedPlan)
      .flatMap(_.inputPartitions).flatMap {
        case fp: FilePartition =>
          fp.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty[String]
      }.distinct
  }

  test("a clustered ranged lookup plans over ONE file of eight — " +
      "files-planned < files-live, answers unchanged") {
    registered()
    val path = s"$root/clustered"
    EpochTable.refresh(spark, path, mkTyped(1L to 4000L), version = 0L)
    EpochTable.compact(spark, path, nFiles = 8,
      clusterBy = Seq("event_id"))
    val live = EpochTable.dataFiles(spark, path,
      Epoch.resolve(spark, path).get)
    assert(live.size === 8)
    val q = spark.sql("SELECT * FROM gstat.clustered " +
      "WHERE event_id BETWEEN 1100 AND 1120")
    val planned = plannedFiles(q)
    assert(planned.size < live.size && planned.size <= 2,
      s"stats pruning did not fire: planned ${planned.size} of " +
        s"${live.size}")
    // identical answer to the unpruned programmatic face
    val expect = EpochTable.serve(spark, path)
      .where(col("event_id").between(1100L, 1120L))
      .orderBy("event_id").collect().toSeq
    assert(q.orderBy("event_id").collect().toSeq === expect)
    // an unfiltered scan plans every file (no pruning without filters)
    assert(plannedFiles(spark.sql("SELECT * FROM gstat.clustered"))
      .size === 8)
  }

  test("a condition no file can satisfy degrades to a one-file plan " +
      "returning zero rows; IS NULL prunes on null counts only when " +
      "a file is provably all-non-null") {
    registered()
    val path = s"$root/degenerate"
    EpochTable.refresh(spark, path, mkTyped(1L to 2000L), version = 0L)
    EpochTable.compact(spark, path, nFiles = 4,
      clusterBy = Seq("event_id"))
    val impossible = spark.sql(
      "SELECT * FROM gstat.degenerate WHERE event_id > 99999999")
    assert(plannedFiles(impossible).size === 1)
    assert(impossible.count() === 0L)
    // every file holds some NULL uids → IS NULL prunes nothing
    assert(plannedFiles(spark.sql(
      "SELECT * FROM gstat.degenerate WHERE uid IS NULL")).size === 4)
    // ... but IS NULL conjoined with a range rides the range's pruning
    assert(plannedFiles(spark.sql(
      "SELECT * FROM gstat.degenerate " +
        "WHERE uid IS NULL AND event_id < 400")).size === 1)
  }

  test("generations prune independently: a delta-grown table skips " +
      "the generation the predicate disproves") {
    registered()
    val path = s"$root/gens"
    EpochTable.refresh(spark, path, mkTyped(1L to 1000L), version = 0L)
    EpochTable.refreshDelta(spark, path, mkTyped(1001L to 2000L),
      version = 1L)
    val m = Epoch.resolve(spark, path).get
    val live = EpochTable.dataFiles(spark, path, m)
    val g0 = live.filter(_.getPath.toUri.getPath.contains("/g0/"))
      .map(_.getPath.toUri.getPath).toSet
    assert(g0.nonEmpty && g0.size < live.size)
    val q = spark.sql(
      "SELECT * FROM gstat.gens WHERE event_id <= 1000")
    val planned = plannedFiles(q)
      .map(p => new org.apache.hadoop.fs.Path(
        new java.net.URI(p)).toUri.getPath).toSet
    assert(planned.subsetOf(g0),
      s"delta generation not pruned: $planned vs g0=$g0")
    assert(q.count() === 1000L)
  }

  test("a legacy manifest without a stats component is never pruned " +
      "— and never wrong") {
    registered()
    val path = s"$root/legacy"
    mkTyped(1L to 300L).write.parquet(s"$path/g0/data")
    Epoch.commit(spark, path, Epoch.Manifest(0L,
      Map("data" -> Seq("g0/data")), Seq("ver_0")))
    // no meta row → the catalog still serves reads (versions faces
    // would refuse); the scan must fall back to all files
    val live = EpochTable.dataFiles(spark, path,
      Epoch.resolve(spark, path).get).size
    val q = spark.sql(
      "SELECT * FROM gstat.legacy WHERE event_id = 7")
    assert(plannedFiles(q).size === live)
    assert(q.count() === 1L)
  }

  test("the scan REPORTS statistics: exact manifest row counts reach " +
      "the planner, and a stats-pruned-to-one-file side of a join " +
      "earns a static BroadcastHashJoin with no hint") {
    registered()
    val big = s"$root/statbig"
    val small = s"$root/statsmall"
    EpochTable.refresh(spark, big, mkTyped(1L to 30000L), version = 0L)
    EpochTable.refresh(spark, small, mkTyped(1L to 4000L), version = 0L)
    EpochTable.compact(spark, small, nFiles = 8,
      clusterBy = Seq("event_id"))
    // the unfiltered scan's logical stats carry the EXACT row count
    // from the manifest stats component (not a size-derived guess)
    val rc = spark.sql("SELECT * FROM gstat.statbig")
      .queryExecution.optimizedPlan.stats.rowCount
    assert(rc === Some(BigInt(30000)), rc.toString)
    // pruned-to-one-file side: the STATIC plan (pre-AQE) must already
    // broadcast it — before stats reporting, the wrapper hid the
    // delegate's size and both epoch scans planned as huge (SMJ)
    val j = spark.sql(
      "SELECT b.event_id, b.uid, s.etype FROM gstat.statbig b " +
        "JOIN gstat.statsmall s ON b.event_id = s.event_id " +
        "WHERE s.event_id BETWEEN 100 AND 140")
    val staticPlan = j.queryExecution.sparkPlan
    assert(staticPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, s"pruned side not broadcast statically:\n$staticPlan")
    assert(j.count() === 41L)
  }

  test("TIMESTAMP stats prune tz-independently: bounds written as " +
      "epoch micros survive a session-timezone flip between writer " +
      "and reader — no silently missing rows, pruning still fires") {
    registered()
    val path = s"$root/tsprune"
    val rows = (1L to 2000L).map(i =>
      (i, new java.sql.Timestamp(1700000000000L + i * 3600000L)))
      .toDF("event_id", "ts")
    EpochTable.refresh(spark, path, rows, version = 0L)
    EpochTable.compact(spark, path, nFiles = 4, clusterBy = Seq("ts"))
    val live = EpochTable.dataFiles(spark, path,
      Epoch.resolve(spark, path).get).size
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // the READER runs nine-and-a-half hours east of the writer —
      // a string-round-tripped bound would shift and could disprove
      // files that hold matches; the micros encoding cannot
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
      val q = spark.sql("SELECT * FROM gstat.tsprune WHERE ts " +
        "BETWEEN TIMESTAMP '2023-12-05 00:00:00' " +
        "AND TIMESTAMP '2023-12-06 00:00:00'")
      val planned = plannedFiles(q)
      assert(planned.size < live,
        s"timestamp pruning did not fire: $planned of $live")
      val expect = EpochTable.serve(spark, path)
        .where(col("ts").between("2023-12-05 00:00:00",
          "2023-12-06 00:00:00"))
        .orderBy("event_id").collect().toSeq
      assert(q.orderBy("event_id").collect().toSeq === expect)
      assert(expect.nonEmpty)
    } finally
      spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("the _g matching-rows subquery plans over the stats-pruned " +
      "set: point file discovery without opening the other files") {
    registered()
    val path = s"$root/gprune"
    EpochTable.refresh(spark, path, mkTyped(1L to 4000L), version = 0L)
    EpochTable.compact(spark, path, nFiles = 8,
      clusterBy = Seq("event_id"))
    val q = spark.sql(
      "SELECT DISTINCT _g FROM gstat.gprune WHERE event_id = 1234")
    assert(plannedFiles(q).size === 1)
    assert(q.count() === 1L)
  }
}
