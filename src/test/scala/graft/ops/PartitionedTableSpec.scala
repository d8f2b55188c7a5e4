package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Date-partitioned epoch tables (round-18 verdict "next" #2): a
  * partitioned refresh lands one directory per partition value, the
  * spec rides the manifest, month-scoped queries prune to the month's
  * files at planning time (via the stats component), and a takedown's
  * fold rewrites ONLY the touched partitions — every other month
  * carries forward BY REFERENCE, so DELETE costs ∝ |touched
  * partitions| instead of ∝ |table|. */
class PartitionedTableSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/partcat"

  private def registered(): Unit =
    graft.sources.EpochTableCatalog.register(spark, "gpart", root)

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")

  /** id, month-spread date, value — 3 months, 30 rows each. */
  private def mkRows(n: Long = 90L) =
    (1L to n).map(i => (i, ts(f"2024-${(i % 3) + 1}%02d-10"), s"v$i"))
      .toDF("id", "dt", "v")

  test("a partitioned refresh lands per-month directories; serving, " +
      "counts, time travel, and replay are unchanged by the layout") {
    val path = s"$root/base"
    val loaded = EpochTable.refreshPartitioned(spark, path, mkRows(),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    assert(loaded === 90L)
    val m = Epoch.resolve(spark, path).get
    val entries = m.components("data")
    assert(entries.size === 3 && entries.forall(_.contains("_p=2024-")),
      entries.toString)
    assert(EpochTable.serve(spark, path).count() === 90L)
    assert(EpochTable.serve(spark, path).columns.toSeq ===
      Seq("id", "dt", "v")) // `_p` is derived, never served
    // replay is a ledger no-op
    assert(EpochTable.refreshPartitioned(spark, path, mkRows(5L),
      version = 0L, EpochTable.PartSpec("dt", "month")) === 90L)
    // a second partitioned version; version 0 stays addressable
    EpochTable.refreshPartitioned(spark, path, mkRows(120L),
      version = 1L, EpochTable.PartSpec("dt", "month"))
    assert(EpochTable.dataForVersion(spark, path, 0L).get.count() === 90L)
    assert(EpochTable.serve(spark, path).count() === 120L)
  }

  test("SQL DELETE folds ONLY the touched partition: the other " +
      "months' directories carry forward by reference, byte-identical") {
    registered()
    val path = s"$root/pdel"
    // junk rows confined to month 2024-02
    val junk = (1000L to 1019L).map(i =>
      (i, ts("2024-02-20"), "JUNK")).toDF("id", "dt", "v")
    EpochTable.refreshPartitioned(spark, path,
      mkRows().unionByName(junk), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    val before = Epoch.resolve(spark, path).get
    val beforeFiles = EpochTable.dataFiles(spark, path, before)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    spark.sql("DELETE FROM gpart.pdel WHERE v = 'JUNK'")
    val after = Epoch.resolve(spark, path).get
    // untouched months: identical directory ENTRIES (by reference)
    val beforeByMonth = before.components("data").groupBy(e =>
      e.split("/").find(_.startsWith("_p=")).get)
    val afterByMonth = after.components("data").groupBy(e =>
      e.split("/").find(_.startsWith("_p=")).get)
    assert(afterByMonth("_p=2024-01") === beforeByMonth("_p=2024-01"))
    assert(afterByMonth("_p=2024-03") === beforeByMonth("_p=2024-03"))
    assert(afterByMonth("_p=2024-02") !== beforeByMonth("_p=2024-02"))
    // the carried files are the same bytes (mtime+len unchanged)
    val afterFiles = EpochTable.dataFiles(spark, path, after)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    assert(beforeFiles.intersect(afterFiles).nonEmpty)
    // served = exactly the real rows; tombstones folded away
    assert(after.components.getOrElse("tombstones", Seq.empty).isEmpty)
    val served = spark.sql("SELECT * FROM gpart.pdel")
    assert(served.count() === 90L)
    assert(served.where(col("v") === "JUNK").isEmpty)
  }

  test("a month-scoped query plans only that month's files (stats " +
      "pruning over partition-aligned intervals)") {
    registered()
    val path = s"$root/pscan"
    EpochTable.refreshPartitioned(spark, path, mkRows(300L),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    val q = spark.sql("SELECT * FROM gpart.pscan " +
      "WHERE dt >= TIMESTAMP '2024-02-01 00:00:00' " +
      "AND dt < TIMESTAMP '2024-03-01 00:00:00'")
    q.collect()
    val scans = {
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case other => other.children.flatMap(walk) ++ (other match {
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
              Seq(b)
            case _ => Seq.empty
          })
        }
      walk(q.queryExecution.executedPlan)
    }
    val planned = scans.flatMap(_.inputPartitions).flatMap {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.files.map(_.filePath.toString).toSeq
      case _ => Seq.empty[String]
    }.distinct
    assert(planned.nonEmpty && planned.forall(_.contains("_p=2024-02")),
      planned.toString)
    assert(q.count() === 100L)
  }

  test("key-only tombstones (no partition column) fold EVERY " +
      "partition — conservative, never wrong; deltas/merges/renames " +
      "refuse on partitioned tables") {
    val path = s"$root/conserv"
    EpochTable.refreshPartitioned(spark, path, mkRows(), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    // programmatic key-only takedown: tombstones carry only `id`+`v`?
    // no — delete matches FULL rows null-safely; key-only means the
    // tombstone frame has a SUBSET of columns
    EpochTable.delete(spark,
      EpochTable.serve(spark, path).where(col("id") === 7L)
        .select("id", "v"), path, batchId = 1L)
    // the delete-path fold cannot derive the touched set without the
    // partition column — it must fold everything, conservatively
    EpochTable.compactForDelete(spark, path)
    val served = EpochTable.serve(spark, path)
    assert(served.count() === 89L)
    assert(served.where(col("id") === 7L).isEmpty)
    // still partitioned after the fold
    val m = Epoch.resolve(spark, path).get
    assert(m.components("data").forall(_.contains("_p=")),
      m.components("data").toString)
    assert(EpochTable.partSpecOf(spark, path, m).nonEmpty)
    // deltas are partition-AWARE and renames converge at the fold
    // (their own tests); programmatic merge-on-read still refuses —
    // SQL MERGE routes through the CoW path instead
    val e2 = intercept[IllegalArgumentException] {
      EpochTable.merge(spark, path, mkRows(5L), version = 9L,
        keys = Seq("id"))
    }
    assert(e2.getMessage.contains("partitioned"), e2.getMessage)
  }

  test("partition-aligned deltas: a monthly delta adds only its " +
      "months' dirs; the maintenance fold rewrites only FRAGMENTED " +
      "months — unfragmented ones never rewrite") {
    val path = s"$root/pdelta"
    // base: 3 months (ids 1..90); delta touches ONLY month 2024-02
    EpochTable.refreshPartitioned(spark, path, mkRows(), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    val delta = (200L to 219L).map(i =>
      (i, ts("2024-02-05"), s"d$i")).toDF("id", "dt", "v")
    EpochTable.refreshDelta(spark, path, delta, version = 1L)
    val m1 = Epoch.resolve(spark, path).get
    val deltaEntries = m1.components("data")
      .filterNot(Epoch.resolveAsOf(spark, path, 0L).get
        .components("data").contains)
    assert(deltaEntries.nonEmpty &&
      deltaEntries.forall(_.contains("_p=2024-02")),
      deltaEntries.toString)
    assert(EpochTable.serve(spark, path).count() === 110L)
    // the fold: month 02 is fragmented (2 dirs) → rewrites; months
    // 01 and 03 are single-dir, untombed → carried BY REFERENCE
    val beforeFiles = EpochTable.dataFiles(spark, path, m1)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    EpochTable.compact(spark, path)
    val m2 = Epoch.resolve(spark, path).get
    def byMonth(m: Epoch.Manifest) = m.components("data").groupBy(e =>
      e.split("/").find(_.startsWith("_p=")).get)
    assert(byMonth(m2)("_p=2024-01") === byMonth(m1)("_p=2024-01"))
    assert(byMonth(m2)("_p=2024-03") === byMonth(m1)("_p=2024-03"))
    assert(byMonth(m2)("_p=2024-02").size === 1)
    assert(byMonth(m2)("_p=2024-02") !== byMonth(m1)("_p=2024-02"))
    val afterFiles = EpochTable.dataFiles(spark, path, m2)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    assert(beforeFiles.intersect(afterFiles).nonEmpty)
    assert(EpochTable.serve(spark, path).count() === 110L)
    // a fold with nothing fragmented and no tombstones is a NO-OP
    val head = Epoch.resolve(spark, path).get.epoch
    EpochTable.compact(spark, path)
    assert(Epoch.resolve(spark, path).get.epoch === head)
  }

  test("partitioned CTAS: PARTITIONED BY (months(col)) births a " +
      "month-partitioned layout; identity transform works; exotic " +
      "transforms refuse") {
    registered()
    mkRows(60L).createOrReplaceTempView("pctas_src")
    spark.sql("CREATE TABLE gpart.pctas " +
      "PARTITIONED BY (months(dt)) AS SELECT * FROM pctas_src")
    val path = s"$root/pctas"
    val m = Epoch.resolve(spark, path).get
    assert(EpochTable.partSpecOf(spark, path, m)
      === Some(EpochTable.PartSpec("dt", "month")))
    assert(m.components("data").forall(_.contains("_p=2024-")))
    assert(spark.sql("SELECT * FROM gpart.pctas").count() === 60L)
    // identity transform
    spark.sql("CREATE TABLE gpart.pctas_id " +
      "PARTITIONED BY (v) AS SELECT * FROM pctas_src WHERE id <= 3")
    assert(EpochTable.partSpecOf(spark, s"$root/pctas_id",
      Epoch.resolve(spark, s"$root/pctas_id").get)
      === Some(EpochTable.PartSpec("v", "identity")))
    // years/days grains are first-class too
    spark.sql("CREATE TABLE gpart.pctas_yr " +
      "PARTITIONED BY (years(dt)) AS SELECT * FROM pctas_src")
    assert(EpochTable.partSpecOf(spark, s"$root/pctas_yr",
      Epoch.resolve(spark, s"$root/pctas_yr").get)
      === Some(EpochTable.PartSpec("dt", "year")))
    assert(Epoch.resolve(spark, s"$root/pctas_yr").get
      .components("data").forall(_.contains("_p=2024")))
    // unsupported transform refuses loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gpart.pctas_bad " +
        "PARTITIONED BY (hours(dt)) AS SELECT * FROM pctas_src")
    }
    assert(e.getMessage.contains("unsupported partition transform"),
      e.getMessage)
  }

  test("SQL MERGE works on a partitioned table through the " +
      "copy-on-write path: touched files rewrite, the partition spec " +
      "survives, and the next fold re-partitions the residue") {
    registered()
    val path = s"$root/pmerge"
    // plant stale rows in month 2; heal them + insert fresh via MERGE
    EpochTable.refreshPartitioned(spark, path,
      mkRows().withColumn("v",
        when(col("id") % 10 === 1, lit("STALE"))
          .otherwise(col("v"))),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    mkRows(100L).where(col("id") % 10 === 1)
      .unionByName((500L to 504L).map(i =>
        (i, ts("2024-02-02"), s"new$i")).toDF("id", "dt", "v"))
      .createOrReplaceTempView("pmerge_src")
    spark.sql("""
      MERGE INTO gpart.pmerge t USING pmerge_src s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    // 90 base + 1 fresh matched key (91) + 5 planted news = 96
    val served = spark.sql("SELECT * FROM gpart.pmerge")
    assert(served.count() === 96L)
    assert(served.where(col("v") === "STALE").isEmpty)
    assert(served.where(col("v").startsWith("new")).count() === 5L)
    // the declared partitioning survived the rewrite
    val m = Epoch.resolve(spark, path).get
    assert(EpochTable.partSpecOf(spark, path, m).nonEmpty)
    // the fold absorbs the rewrite's unpartitioned staging back into
    // per-month dirs
    EpochTable.compact(spark, path)
    assert(Epoch.resolve(spark, path).get
      .components("data").forall(_.contains("_p=")))
    assert(spark.sql("SELECT * FROM gpart.pmerge").count() === 96L)
  }

  test("within-partition clustering: compact(clusterBy) range-splits " +
      "inside each month, so month pruning and key-range pruning " +
      "compose in the stats component") {
    registered()
    val path = s"$root/pclust"
    EpochTable.refreshPartitioned(spark, path, mkRows(3000L),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    EpochTable.compact(spark, path, nFiles = 12, clusterBy = Seq("id"))
    val m = Epoch.resolve(spark, path).get
    assert(m.components("data").forall(_.contains("_p=2024-")))
    val month2Files = EpochTable.dataFiles(spark, path, m)
      .map(_.getPath.toUri.getPath).filter(_.contains("_p=2024-02"))
    assert(month2Files.size >= 3, month2Files.toString)
    val q = spark.sql("SELECT * FROM gpart.pclust " +
      "WHERE dt >= TIMESTAMP '2024-02-01 00:00:00' " +
      "AND dt < TIMESTAMP '2024-03-01 00:00:00' " +
      "AND id BETWEEN 1 AND 300")
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
    val planned = walk(q.queryExecution.executedPlan)
      .flatMap(_.inputPartitions).flatMap {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty[String]
      }.distinct
    // month pruning AND in-month range pruning both fired
    assert(planned.nonEmpty && planned.forall(_.contains("_p=2024-02")),
      planned.toString)
    assert(planned.size < month2Files.size,
      s"in-month clustering did not prune: ${planned.size} of " +
        s"${month2Files.size}")
    assert(q.count() ===
      (1L to 300L).count(i => (i % 3) + 1 == 2))
  }

  test("streaming writes land on a partitioned table as residue the " +
      "next fold absorbs into partitions") {
    registered()
    val src = s"$root/stwp_src"
    val tgt = s"$root/stwp_tgt"
    EpochTable.refresh(spark, src, mkRows(30L), version = 0L)
    val extra = (200L to 229L).map(i =>
      (i, ts(f"2024-${(i % 3) + 1}%02d-15"), s"x$i"))
      .toDF("id", "dt", "v")
    EpochTable.refreshDelta(spark, src, extra, version = 1L)
    EpochTable.refreshPartitioned(spark, tgt, mkRows(), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    val q = spark.readStream.option("startingVersion", "1")
      .table("gpart.stwp_src")
      .writeStream.option("checkpointLocation", s"$root/stwp_ckpt")
      .toTable("gpart.stwp_tgt")
    try q.processAllAvailable() finally q.stop()
    val m = Epoch.resolve(spark, tgt).get
    // the batch landed as a residue entry (no partition regroup paid
    // per batch); serving is correct throughout
    assert(m.components("data").exists(e => !e.contains("_p=")),
      m.components("data").toString)
    assert(spark.sql("SELECT * FROM gpart.stwp_tgt").count() === 120L)
    // the fold absorbs the residue into per-month dirs
    EpochTable.compact(spark, tgt)
    val m2 = Epoch.resolve(spark, tgt).get
    assert(m2.components("data").forall(_.contains("_p=")),
      m2.components("data").toString)
    assert(spark.sql("SELECT * FROM gpart.stwp_tgt").count() === 120L)
  }

  test("ALTER TABLE RENAME COLUMN on a partitioned table: mapped " +
      "serving until the fold converges per-month files under the " +
      "new names; renaming the partition column refuses") {
    registered()
    val path = s"$root/pren"
    EpochTable.refreshPartitioned(spark, path, mkRows(), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    spark.sql("ALTER TABLE gpart.pren RENAME COLUMN v TO label")
    // mapped read-only serving mid-divergence
    val served = spark.sql("SELECT * FROM gpart.pren")
    assert(served.columns.toSeq === Seq("id", "dt", "label"))
    assert(served.count() === 90L)
    // a delete-path fold refuses mid-divergence (converge first)
    val e1 = intercept[IllegalArgumentException] {
      EpochTable.compactForDelete(spark, path)
    }
    assert(e1.getMessage.contains("converges"), e1.getMessage)
    // the maintenance fold converges: physical files carry the new
    // name, still per-month, marker cleared, DML reopens
    EpochTable.compact(spark, path)
    val m = Epoch.resolve(spark, path).get
    assert(!EpochTable.isDiverged(m))
    assert(m.components("data").forall(_.contains("_p=2024-")))
    assert(spark.sql("SELECT * FROM gpart.pren").columns.toSeq
      === Seq("id", "dt", "label"))
    spark.sql("DELETE FROM gpart.pren WHERE label = 'v7'")
    assert(spark.sql("SELECT * FROM gpart.pren").count() === 89L)
    // the partition column itself can never rename or drop
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gpart.pren RENAME COLUMN dt TO when_at")
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gpart.pren DROP COLUMN dt")
    }
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
  }

  test("planning is BOUNDED to surviving partitions: a one-month " +
      "query on a 12-month table materializes only that month's " +
      "stats rows driver-side, and entry pruning works even before " +
      "any stats row is read") {
    registered()
    val path = s"$root/bound"
    // 12 months, 40 rows each
    val rows = (1L to 480L).map(i =>
      (i, ts(f"2024-${(i % 12) + 1}%02d-10"), s"v$i"))
      .toDF("id", "dt", "v")
    EpochTable.refreshPartitioned(spark, path, rows, version = 0L,
      EpochTable.PartSpec("dt", "month"))
    val m = Epoch.resolve(spark, path).get
    assert(m.components("data").size === 12)
    // total stats rows vs the one month's share
    val allStats = Epoch.read(spark, path, m, "stats").get.collect()
    val monthStats = allStats.count(
      _.getAs[String]("file").contains("_p=2024-07"))
    assert(monthStats > 0 && monthStats < allStats.length)
    EpochTable.statsRowsRead.set(0L)
    val q = spark.sql("SELECT * FROM gpart.bound " +
      "WHERE dt >= TIMESTAMP '2024-07-01 00:00:00' " +
      "AND dt < TIMESTAMP '2024-08-01 00:00:00'")
    assert(q.count() === 40L)
    // Spark builds the scan twice per action (aggregate-pushdown
    // probe + final build), so the bound is 2× the month's rows —
    // the point is it never approaches the table's 144
    val read = EpochTable.statsRowsRead.get()
    assert(read > 0 && read <= 2L * monthStats,
      s"scan build read $read stats rows; the month owns $monthStats " +
        s"of ${allStats.length}")
    // an unfiltered scan still reads the full stats (row-count
    // reporting) — behavior unchanged where nothing prunes
    EpochTable.statsRowsRead.set(0L)
    assert(spark.sql("SELECT * FROM gpart.bound").count() === 480L)
    assert(EpochTable.statsRowsRead.get() >= allStats.length.toLong)
  }

  test("partition-level entry pruning needs NO stats component: a " +
      "hand-committed partitioned manifest without stats still plans " +
      "only the asked month's files") {
    registered()
    val path = s"$root/nostats"
    import org.apache.spark.sql.functions.date_format
    val rows = (1L to 90L).map(i =>
      (i, ts(f"2024-${(i % 3) + 1}%02d-10"), s"v$i"))
      .toDF("id", "dt", "v")
    rows.withColumn("_p", date_format(col("dt"), "yyyy-MM"))
      .write.partitionBy("_p").parquet(s"$path/g0/data")
    Seq(("dt", "month")).toDF("col", "transform")
      .coalesce(1).write.parquet(s"$path/g0/partspec")
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = f.listStatus(new org.apache.hadoop.fs.Path(s"$path/g0/data"))
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    Epoch.commit(spark, path, Epoch.Manifest(0L,
      Map("data" -> parts.map(p => s"g0/data/$p").toSeq,
        "partspec" -> Seq("g0/partspec")), Seq("ver_0")))
    val q = spark.sql("SELECT * FROM gpart.nostats " +
      "WHERE dt >= TIMESTAMP '2024-02-01 00:00:00' " +
      "AND dt < TIMESTAMP '2024-03-01 00:00:00'")
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
    val planned = walk(q.queryExecution.executedPlan)
      .flatMap(_.inputPartitions).flatMap {
        case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
          fp.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty[String]
      }.distinct
    assert(planned.nonEmpty && planned.forall(_.contains("_p=2024-02")),
      planned.toString)
    assert(q.count() === 30L)
  }

  test("the fold's tombstone-touched derivation is session-tz-stable: " +
      "a DELETE run in another timezone still folds exactly the " +
      "writer's touched partition and removes the rows") {
    registered()
    val path = s"$root/ptz"
    // junk confined to month 2024-02 — written under UTC
    val junk = (1000L to 1009L).map(i =>
      (i, ts("2024-02-20"), "JUNK")).toDF("id", "dt", "v")
    EpochTable.refreshPartitioned(spark, path,
      mkRows().unionByName(junk), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    val before = Epoch.resolve(spark, path).get
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a session far west of UTC: a tz-dependent date_format would
      // derive 2024-02-19 wall dates — same month here, so go further:
      // month boundaries. Plant a boundary row: 2024-03-01T00:00 UTC
      // renders as 2024-02 in a UTC-8 session under the OLD derivation
      spark.conf.set("spark.sql.session.timeZone",
        "America/Los_Angeles")
      spark.sql("DELETE FROM gpart.ptz WHERE v = 'JUNK'")
    } finally
      spark.conf.set("spark.sql.session.timeZone", prevTz)
    val after = Epoch.resolve(spark, path).get
    def byMonth(m: Epoch.Manifest) = m.components("data").groupBy(e =>
      e.split("/").find(_.startsWith("_p=")).get)
    // only the tombstoned month folded; the others carried by
    // reference — and the doomed rows are GONE (an under-derived
    // touched set would clear the tombstone while the rows survive)
    assert(byMonth(after)("_p=2024-01") === byMonth(before)("_p=2024-01"))
    assert(byMonth(after)("_p=2024-03") === byMonth(before)("_p=2024-03"))
    assert(byMonth(after)("_p=2024-02") !== byMonth(before)("_p=2024-02"))
    val served = EpochTable.serve(spark, path)
    assert(served.count() === 90L)
    assert(served.where(col("v") === "JUNK").isEmpty)
  }

  test("INSERT OVERWRITE preserves the partition spec: the reload " +
      "lands per-month like the layout it replaces") {
    registered()
    val path = s"$root/pow"
    EpochTable.refreshPartitioned(spark, path, mkRows(), version = 0L,
      EpochTable.PartSpec("dt", "month"))
    mkRows(60L).createOrReplaceTempView("pow_src")
    spark.sql("INSERT OVERWRITE gpart.pow SELECT * FROM pow_src")
    val m = Epoch.resolve(spark, path).get
    assert(EpochTable.partSpecOf(spark, path, m).nonEmpty)
    assert(m.components("data").forall(_.contains("_p=2024-")),
      m.components("data").toString)
    assert(spark.sql("SELECT * FROM gpart.pow").count() === 60L)
  }
}
