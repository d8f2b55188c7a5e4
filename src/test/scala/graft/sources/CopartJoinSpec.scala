package graft.sources

import graft.SparkTestBase
import graft.ops.{Epoch, EpochTable}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Storage-partitioned joins on the epoch table tier (round-18
  * verdict "next" #3): two tables folded into the same hash-bucket
  * layout report `KeyGroupedPartitioning(bucket(n, key))` from their
  * scans and equi-join with ZERO exchanges — the epoch-tier twin of
  * `BucketedJoinSpec`'s standalone-sink proof. The claim is withdrawn
  * (plain scan, ordinary shuffle join — never a wrong answer) when a
  * row-level rewrite leaves unbucketed files, and restored by the next
  * fold. */
class CopartJoinSpec extends SparkTestBase {

  import spark.implicits._

  private val root = s"${graft.GraftSession.scratchDir}/copartcat"

  private def registered(): Unit =
    EpochTableCatalog.register(spark, "gcop", root)

  private def dim(n: Long) =
    (1L to n).map(i => (i, s"name$i")).toDF("k", "name")

  private def fact(n: Long, keys: Long) =
    (1L to n).map(i => (i, (i % keys) + 1L, i * 1.5))
      .toDF("fid", "k", "amt")

  private def buildBucketed(): (String, String) = {
    val d = s"$root/jdim"
    val f = s"$root/jfact"
    if (Epoch.resolve(spark, d).isEmpty) {
      EpochTable.refresh(spark, d, dim(200L), version = 0L)
      EpochTable.compactBucketed(spark, d, "k", nBuckets = 4)
      EpochTable.refresh(spark, f, fact(3000L, 200L), version = 0L)
      EpochTable.compactBucketed(spark, f, "k", nBuckets = 4)
    }
    (d, f)
  }

  test("co-bucketed epoch tables sort-merge join with no exchange; " +
      "the answer matches the plain join") {
    registered()
    buildBucketed()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        "SELECT d.k, d.name, f.fid, f.amt " +
          "FROM gcop.jdim d JOIN gcop.jfact f ON d.k = f.k")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!"\\(\\d+\\) Exchange".r.findFirstIn(plan).isDefined,
        s"co-partitioned epoch join still exchanges:\n$plan")
      // the fold also sorted within buckets and the scan REPORTS it:
      // the merge join runs without its sorts either
      assert(!"\\(\\d+\\) Sort\\b".r.findFirstIn(plan).isDefined,
        s"sorted-bucket join still sorts:\n$plan")
      assert(joined.count() === 3000L)
      // byte-for-byte the plain join's answer
      val expect = dim(200L).join(fact(3000L, 200L), "k")
        .select(col("k"), col("name"), col("fid"), col("amt"))
        .orderBy("fid").collect().toSeq
      assert(joined.orderBy("fid").collect().toSeq === expect)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key also rides the reported " +
      "partitioning (no exchange before the final agg)") {
    registered()
    buildBucketed()
    val agg = spark.sql(
      "SELECT k, COUNT(*) AS n FROM gcop.jfact GROUP BY k")
    val plan = agg.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!"\\(\\d+\\) Exchange".r.findFirstIn(plan).isDefined,
      s"group-by on the bucket key still exchanges:\n$plan")
    assert(agg.count() === 200L)
  }

  test("CALL compact_bucketed buckets a table through SQL and the " +
      "zero-exchange join follows") {
    registered()
    val a = s"$root/cb_a"
    val b = s"$root/cb_b"
    EpochTable.refresh(spark, a, dim(100L), version = 0L)
    EpochTable.refresh(spark, b, fact(1500L, 100L), version = 0L)
    spark.sql(
      "CALL gcop.compact_bucketed(`table` => 'cb_a', key => 'k', " +
        "n_buckets => 4)")
    spark.sql(
      "CALL gcop.compact_bucketed(`table` => 'cb_b', key => 'k', " +
        "n_buckets => 4)")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        "SELECT a.k, a.name, b.fid FROM gcop.cb_a a " +
          "JOIN gcop.cb_b b ON a.k = b.k")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!"\\(\\d+\\) Exchange".r.findFirstIn(plan).isDefined,
        s"CALL-bucketed join still exchanges:\n$plan")
      assert(joined.count() === 1500L)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a point DELETE on a bucketed table folds only the TOUCHED " +
      "bucket — the other buckets carry by reference and the join " +
      "layout survives") {
    registered()
    val path = s"$root/bdel"
    EpochTable.refresh(spark, path, fact(2000L, 100L), version = 0L)
    EpochTable.compactBucketed(spark, path, "k", nBuckets = 4)
    val before = Epoch.resolve(spark, path).get
    val beforeFiles = EpochTable.dataFiles(spark, path, before)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    spark.sql("DELETE FROM gcop.bdel WHERE fid = 123")
    val after = Epoch.resolve(spark, path).get
    // tombstones carry the key, so exactly ONE bucket rewrote
    val carried = after.components("data")
      .intersect(before.components("data"))
    assert(carried.size === 3, after.components("data").toString)
    assert(after.components("data").forall(_.contains("_b=")))
    assert(after.components.getOrElse("tombstones", Seq.empty).isEmpty)
    val afterFiles = EpochTable.dataFiles(spark, path, after)
      .map(st => (st.getPath.toUri.getPath, st.getModificationTime,
        st.getLen)).toSet
    assert(beforeFiles.intersect(afterFiles).nonEmpty)
    val served = spark.sql("SELECT * FROM gcop.bdel")
    assert(served.count() === 1999L)
    assert(served.where(col("fid") === 123L).isEmpty)
  }

  test("a row-level rewrite withdraws the co-partitioning claim " +
      "(unbucketed staged files) and the next fold restores it") {
    registered()
    val path = s"$root/jrw"
    EpochTable.refresh(spark, path, fact(2000L, 100L), version = 0L)
    EpochTable.compactBucketed(spark, path, "k", nBuckets = 4)
    def reports(): Boolean = {
      val df = spark.sql(s"SELECT * FROM gcop.jrw")
      df.collect()
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
      walk(df.queryExecution.executedPlan).flatMap(_.inputPartitions)
        .exists(_.isInstanceOf[EpochTableStream.BucketKeyedPartition])
    }
    assert(reports())
    spark.sql("UPDATE gcop.jrw SET amt = 0.0 WHERE fid = 17")
    assert(!reports(),
      "rewrite residue must withdraw the bucketing claim")
    // served rows stay right throughout
    assert(spark.sql("SELECT * FROM gcop.jrw").count() === 2000L)
    assert(spark.sql(
      "SELECT amt FROM gcop.jrw WHERE fid = 17").head().getDouble(0)
      === 0.0)
    // the fold re-buckets (compact on a bucketed table preserves the
    // declared layout) and the claim returns
    Epoch.occ(spark, path) { EpochTable.compact(spark, path) }
    assert(reports())
    assert(spark.sql("SELECT * FROM gcop.jrw").count() === 2000L)
  }
}
