package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The co-located join seam: two tables bucketed on the same join key
  * must join with ZERO exchanges — at 100 TB this is the difference
  * between re-shuffling the fact table on every join and never shuffling
  * it at all. */
class BucketedJoinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed tables sort-merge join with no exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force SMJ so a broadcast can't mask the exchange question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      PartitionedSink.writeBucketed(
        graft.Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_quantity"),
        "bj_lineitem", "l_orderkey", buckets = 4)
      PartitionedSink.writeBucketed(
        graft.Tables.orders(spark, sf)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
        "bj_orders", "l_orderkey", buckets = 4)

      val joined = spark.table("bj_lineitem")
        .join(spark.table("bj_orders"), "l_orderkey")
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!"\\(\\d+\\) Exchange".r.findFirstIn(plan).isDefined,
        s"bucketed join still exchanges:\n$plan")

      // and it's still correct
      val expected = graft.Tables.lineitem(spark, sf)
        .join(graft.Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bj_lineitem")
      spark.sql("DROP TABLE IF EXISTS bj_orders")
    }
  }
}
