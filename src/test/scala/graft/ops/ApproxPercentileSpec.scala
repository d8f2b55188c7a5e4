package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Accuracy contract of the sketch-based percentile (the 100 TB path the
  * exact `agg_percentile` query documents against): at accuracy 10000
  * the approximate rank error is ≤ 1/10000, so on sf0.1 lineitem the
  * estimate must land within 1% of the exact interpolated value. Same
  * discipline as ApproxDistinctSpec for HLL. */
class ApproxPercentileSpec extends SparkTestBase {

  test("approx_percentile lands within 1% of exact at sf0.1") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select(col("l_extendedprice").cast(DoubleType).as("x"),
        col("l_linestatus"))
    val rows = li.groupBy("l_linestatus")
      .agg(
        expr("percentile(x, array(0.25, 0.5, 0.9))").as("exact"),
        expr("approx_percentile(x, array(0.25, 0.5, 0.9), 10000)")
          .as("approx"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 0 until 3) {
      val e = r.getSeq[Double](1)(i)
      val a = r.getSeq[Double](2)(i)
      assert(math.abs(a - e) <= 0.01 * math.abs(e),
        s"${r.getString(0)} p$i: approx $a vs exact $e")
    }
  }
}
