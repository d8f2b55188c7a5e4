package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Tolerance check for the HLL++ estimator behind `agg_approx_distinct`
  * (rows-only in the driver's gate — no exact oracle exists for an
  * approximate aggregate): the estimate must land within ±5% of the exact
  * per-group COUNT(DISTINCT), well inside the rsd=0.01 the query
  * requests. Runs at sf0.1, the same scale the driver verifies. */
class ApproxDistinctSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.1"

  test("approx_count_distinct is within 5% of the exact distinct count") {
    val approx = graft.SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 0.05,
        s"group $flag: approx=$ap exact=$ex relErr=$relErr > 5%")
    }
  }
}
