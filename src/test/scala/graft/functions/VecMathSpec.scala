package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pins the native VecDot/VecNormSq expressions bit-equal to the HOF
  * composition they replaced (aggregate over zip_with/transform, double
  * widening, left-to-right fold), including the null-poisoning and
  * ragged-length semantics zip_with+aggregate give. */
class VecMathSpec extends SparkTestBase {

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  private def hofSumSq(c: Column): Column =
    aggregate(transform(c, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  test("bit-equal to the HOF composition on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val probe = e.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast(DoubleType)))
      .head().getSeq[Double](0).toSeq
    val litProbe = array(probe.map(lit): _*)
    val mismatches = e.select(
      VecMath.vecDot(col("embedding"), litProbe).as("nd"),
      hofDot(col("embedding"), litProbe).as("hd"),
      VecMath.vecNormSq(col("embedding")).as("nn"),
      hofSumSq(col("embedding")).as("hn"))
      .filter(col("nd") =!= col("hd") || col("nn") =!= col("hn"))
      .count()
    assert(mismatches == 0)
  }

  test("null element poisons, ragged lengths give NULL — zip_with parity") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),
      (Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)),
      (Seq[java.lang.Float](1f, 2f, 5f), Seq[java.lang.Float](3f, 4f)))
      .toDF("a", "b")
    val rows = df.select(
      VecMath.vecDot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd")).collect()
    for (r <- rows) assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getDouble(0) == r.getDouble(1)), r.toString)
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("SQL registration via GraftExtensions names") {
    VecMathSpecHelper.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0D, 4.0D)) AS d, " +
        "vec_norm_sq(array(3.0F, 4.0F)) AS n").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0)
  }
}

object VecMathSpecHelper {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm_sq", exprs => VecNormSq(exprs.head), "built-in")
  }
}
