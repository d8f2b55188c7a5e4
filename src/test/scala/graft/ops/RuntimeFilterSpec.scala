package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins Spark's runtime Bloom-filter join pruning: a selective predicate
  * on the dimension side is turned into a bloom filter applied to the
  * FACT side's scan at runtime — at 100 TB this is what keeps a
  * one-committee query from reading every itemization row into the
  * join. Thresholds are lowered so local-scale parquet triggers the
  * injection; the pin is on the optimized plan's filter expression. */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim filter injects a bloom filter on the fact scan") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sf = "/root/testdata/sf0.001"
      val fact = graft.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
      val dim = graft.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = fact.join(dim,
        col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(joined.collect().head.getLong(0) > 0)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
