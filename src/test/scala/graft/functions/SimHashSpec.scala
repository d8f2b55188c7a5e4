package graft.functions

import graft.SparkTestBase
import graft.ops.DedupQueries
import org.apache.spark.sql.functions._

/** Pins the custom one-pass SimHash64 expression to the built-in
  * 64-fold composition it replaces: identical output on real data, both
  * eval paths (interpreted + codegen), usable from SQL, null-safe. */
class SimHashSpec extends SparkTestBase {

  private lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("native expression equals the 64-aggregate built-in composition") {
    val toks = array_distinct(split(col("text"), " "))
    val both = docs.limit(50).select(
      SimHash64.simhash64(toks).as("native"),
      DedupQueries.simhash(toks).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // and the signature is non-trivial (not all zeros)
    assert(both.filter(col("native") =!= 0L).count() > 0)
  }

  test("interpreted eval matches codegen eval") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = ArrayData.toArrayData(
      Array("alpha", "beta", "gamma").map(UTF8String.fromString))
    val direct = SimHash64.compute(arr)
    import spark.implicits._
    val viaPlan = Seq(Seq("alpha", "beta", "gamma")).toDF("toks")
      .select(SimHash64.simhash64(col("toks"))).head().getLong(0)
    assert(direct === viaPlan)
  }

  test("registered SQL function works and hamming distance composes") {
    SimHash64.register(spark)
    docs.limit(20).select(split(col("text"), " ").as("toks"))
      .createOrReplaceTempView("simhash_in")
    val rows = spark.sql(
      """SELECT bit_count(simhash64(toks) ^ simhash64(slice(toks, 1, 10))) AS dist
        |FROM simhash_in""".stripMargin).collect()
    assert(rows.length === 20)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 64))
  }

  test("null and empty arrays are handled") {
    import spark.implicits._
    val df = Seq(Some(Seq.empty[String]), None, Some(Seq("x")))
      .toDF("toks")
      .select(SimHash64.simhash64(col("toks")).as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === 0L) // empty → all votes tie → 0
    assert(rows(1).isNullAt(0)) // null in → null out
  }
}
