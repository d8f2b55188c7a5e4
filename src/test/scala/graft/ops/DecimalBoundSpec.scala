package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the precondition for the decimal→DOUBLE hash-compare trick
  * (AggQueries scaladoc): the cast is only guaranteed to agree across
  * engines while the decimal's scaled integer fits in ~2^53 (beyond that
  * DuckDB's two-step int128→double→÷10^scale cast can drift 1 ulp from
  * Spark's correctly-rounded conversion). This spec fails loudly if the
  * test data ever grows aggregates past the safe bound, instead of
  * letting the correctness gate flake. */
class DecimalBoundSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.1"
  // 2^53: largest integer magnitude exactly representable in a double
  private val safeBound = BigDecimal(2).pow(53)

  test("every money-sum aggregate stays within the 2^53 scaled-unit bound") {
    // the largest-magnitude decimal sums the registry produces, at the
    // largest sf the driver verifies: sum at scale 2 → scaled units = sum·100
    val li = graft.Tables.lineitem(spark, sf)
    val worst = li.agg(
      sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .cast(DecimalType(38, 2)).as("s1"),
      sum((col("l_extendedprice") * col("l_quantity"))
        .cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("s2"))
      .head()
    Seq(worst.getDecimal(0), worst.getDecimal(1)).foreach { d =>
      val scaledUnits = BigDecimal(d.unscaledValue())
      assert(scaledUnits.abs < safeBound,
        s"aggregate magnitude $d exceeds the 2^53 double-exact bound — " +
          "switch the affected query to fixed-scale string rendering")
    }
  }
}
