package graft.sources

import graft.SparkTestBase
import graft.ops.{Epoch, EpochTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExplainMode, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** COMPOSED partition+bucket layouts (round-19 verdict "next" #1):
  * `compactBucketed` on a date-partitioned table writes one directory
  * per (partition value × bucket) cell — `_p=2024-03/_b=5` — so the
  * three levers STACK instead of excluding each other:
  *  - partition pruning (stats component) drops whole months' cells
  *    at planning time;
  *  - the scan reports `KeyGroupedPartitioning(bucket(n, key))` over
  *    the SURVIVING cells, so the equi-join against a co-bucketed
  *    table runs with zero exchanges even month-scoped;
  *  - the delete fold intersects (touched partition × touched
  *    bucket): one doomed key in one month rewrites ONE cell, every
  *    other cell carries forward by reference, byte-identical. */
class PartBucketSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/pbcat"

  private def registered(): Unit =
    EpochTableCatalog.register(spark, "gpb", root)

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")

  /** fact rows over 3 months × keys 1..`keys`. */
  private def fact(n: Long, keys: Long) =
    (1L to n).map(i => (i, (i % keys) + 1L,
      ts(f"2024-${(i % 3) + 1}%02d-10"), i * 1.5))
      .toDF("fid", "k", "dt", "amt")

  private def dim(n: Long) =
    (1L to n).map(i => (i, s"name$i")).toDF("k", "name")

  private def buildComposed(): (String, String) = {
    val d = s"$root/pbdim"
    val f = s"$root/pbfact"
    if (Epoch.resolve(spark, d).isEmpty) {
      EpochTable.refresh(spark, d, dim(100L), version = 0L)
      EpochTable.compactBucketed(spark, d, "k", nBuckets = 4)
      EpochTable.refreshPartitioned(spark, f, fact(3000L, 100L),
        version = 0L, EpochTable.PartSpec("dt", "month"))
      EpochTable.compactBucketed(spark, f, "k", nBuckets = 4)
    }
    (d, f)
  }

  private def plannedFiles(df: DataFrame): Seq[String] = {
    df.collect()
    def walk(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case other => other.children.flatMap(walk) ++ (other match {
        case b: BatchScanExec => Seq(b)
        case _ => Seq.empty
      })
    }
    walk(df.queryExecution.executedPlan)
      .flatMap(_.inputPartitions).flatMap {
        case fp: FilePartition =>
          fp.files.map(_.filePath.toString).toSeq
        case bk: EpochTableStream.BucketKeyedPartition =>
          bk.inner.files.map(_.filePath.toString).toSeq
        case _ => Seq.empty[String]
      }.distinct
  }

  test("the composed layout lands one dir per (month, bucket) cell, " +
      "and the bucket spec + partition spec both ride the manifest") {
    buildComposed()
    val m = Epoch.resolve(spark, s"$root/pbfact").get
    val entries = m.components("data")
    assert(entries.forall(e => e.contains("_p=2024-") &&
      e.contains("_b=")), entries.toString)
    assert(entries.size === 12, entries.toString) // 3 months × 4
    assert(EpochTable.partSpecOf(spark, s"$root/pbfact", m).nonEmpty)
    assert(EpochTable.bucketSpecOf(spark, s"$root/pbfact", m).nonEmpty)
    // serving is layout-invisible
    assert(EpochTable.serve(spark, s"$root/pbfact").count() === 3000L)
  }

  test("a MONTH-SCOPED equi-join plans zero exchanges (broadcast " +
      "off) AND only the month's cells — partition pruning composes " +
      "with the reported bucket partitioning; the answer matches the " +
      "plain join") {
    registered()
    buildComposed()
    val monthFiles = EpochTable.dataFiles(spark, s"$root/pbfact",
      Epoch.resolve(spark, s"$root/pbfact").get)
      .map(_.getPath.toUri.getPath)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        "SELECT d.k, d.name, f.fid, f.amt FROM gpb.pbdim d " +
          "JOIN gpb.pbfact f ON d.k = f.k " +
          "WHERE f.dt >= TIMESTAMP '2024-02-01 00:00:00' " +
          "AND f.dt < TIMESTAMP '2024-03-01 00:00:00'")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!"\\(\\d+\\) Exchange".r.findFirstIn(plan).isDefined,
        s"composed-layout join still exchanges:\n$plan")
      // only the asked month's cells were ever planned
      val planned = plannedFiles(joined)
        .map(p => new org.apache.hadoop.fs.Path(
          new java.net.URI(p)).toUri.getPath)
        .filter(_.contains("pbfact"))
      assert(planned.nonEmpty &&
        planned.forall(_.contains("_p=2024-02")), planned.toString)
      assert(planned.size < monthFiles.size)
      // byte-for-byte the plain join's answer
      val expect = dim(100L).join(
        fact(3000L, 100L).where(col("dt") >= ts("2024-02-01") &&
          col("dt") < ts("2024-03-01")), "k")
        .select(col("k"), col("name"), col("fid"), col("amt"))
        .orderBy("fid").collect().toSeq
      assert(joined.orderBy("fid").collect().toSeq === expect)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a point DELETE folds exactly the (touched month × touched " +
      "bucket) cell: every other cell carries by reference, " +
      "byte-identical, and the composed layout survives") {
    registered()
    val path = s"$root/pbdel"
    EpochTable.refreshPartitioned(spark, path, fact(3000L, 100L),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    EpochTable.compactBucketed(spark, path, "k", nBuckets = 4)
    val before = Epoch.resolve(spark, path).get
    assert(before.components("data").size === 12)
    val beforeFiles = EpochTable.dataFiles(spark, path, before)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    // fid 600: k = (600 % 100) + 1 = 1, month = (600 % 3) + 1 = 1
    spark.sql("DELETE FROM gpb.pbdel WHERE fid = 600")
    val after = Epoch.resolve(spark, path).get
    val carried = after.components("data")
      .intersect(before.components("data"))
    assert(carried.size === 11,
      s"expected 11 carried cells: ${after.components("data")}")
    val rewritten = after.components("data").filterNot(carried.contains)
    assert(rewritten.size === 1 &&
      rewritten.head.contains("_p=2024-01") &&
      rewritten.head.contains("_b="), rewritten.toString)
    // carried cells: same bytes on disk
    val afterFiles = EpochTable.dataFiles(spark, path, after)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    assert(beforeFiles.intersect(afterFiles).size >= 11)
    assert(after.components.getOrElse("tombstones", Seq.empty).isEmpty)
    val served = spark.sql("SELECT * FROM gpb.pbdel")
    assert(served.count() === 2999L)
    assert(served.where(col("fid") === 600L).isEmpty)
    // both specs survived the fold
    assert(EpochTable.partSpecOf(spark, path, after).nonEmpty)
    assert(EpochTable.bucketSpecOf(spark, path, after).nonEmpty)
  }

  test("a partition-aligned delta is RESIDUE: the bucket claim " +
      "withdraws (no mis-join), serving stays right, and the " +
      "maintenance fold re-cells ONLY the fragmented month — other " +
      "months' cells carry by reference") {
    registered()
    val path = s"$root/pbdelta"
    EpochTable.refreshPartitioned(spark, path, fact(3000L, 100L),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    EpochTable.compactBucketed(spark, path, "k", nBuckets = 4)
    // delta confined to month 2024-02
    val delta = (5000L to 5099L).map(i => (i, (i % 100L) + 1L,
      ts("2024-02-20"), i * 1.5)).toDF("fid", "k", "dt", "amt")
    EpochTable.refreshDelta(spark, path, delta, version = 1L)
    val m1 = Epoch.resolve(spark, path).get
    // the delta landed per-month but unbucketed → residue
    assert(m1.components("data").exists(e =>
      e.contains("_p=2024-02") && !e.contains("_b=")),
      m1.components("data").toString)
    assert(spark.sql("SELECT * FROM gpb.pbdelta").count() === 3100L)
    val beforeCells = m1.components("data").filter(_.contains("_b="))
    EpochTable.compact(spark, path)
    val m2 = Epoch.resolve(spark, path).get
    // all-cells again; months 01/03 carried, month 02 re-celled
    assert(m2.components("data").forall(e =>
      e.contains("_p=") && e.contains("_b=")),
      m2.components("data").toString)
    val carried = m2.components("data").intersect(beforeCells)
    assert(carried.size === 8, // 2 untouched months × 4 buckets
      s"carried=${carried.size}: ${m2.components("data")}")
    assert(spark.sql("SELECT * FROM gpb.pbdelta").count() === 3100L)
  }

  test("guards: bucketing ON the partition column refuses; renaming " +
      "or dropping the bucket key refuses; clustering a composed " +
      "layout refuses") {
    val path = s"$root/pbguard"
    EpochTable.refreshPartitioned(spark, path, fact(300L, 10L),
      version = 0L, EpochTable.PartSpec("dt", "month"))
    val e1 = intercept[IllegalArgumentException] {
      EpochTable.compactBucketed(spark, path, "dt", nBuckets = 4)
    }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    EpochTable.compactBucketed(spark, path, "k", nBuckets = 4)
    val e2 = intercept[IllegalArgumentException] {
      EpochTable.renameColumn(spark, path, "k", "key2")
    }
    assert(e2.getMessage.contains("bucket key"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      EpochTable.dropColumn(spark, path, "k")
    }
    assert(e3.getMessage.contains("bucket key"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      EpochTable.compact(spark, path, clusterBy = Seq("amt"))
    }
    assert(e4.getMessage.contains("bucketed"), e4.getMessage)
  }
}
