package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the native one-pass MinHash64 expression bit-equal to the
  * built-in `array_min(transform(xxhash64(lit(i), t)))` composition, and
  * its empty-input null semantics. */
class MinHashSpec extends SparkTestBase {

  private val k = 8

  test("native minhash64 equals the built-in xxhash64 composition") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = array_distinct(split(col("text"), " "))
    val composed = array((0 until k).map(i =>
      array_min(transform(toks, t => xxhash64(lit(i.toLong), t)))): _*)
    val both = docs.select(
      MinHash64.minhash64(toks, k).as("native"),
      composed.as("composed"))
    assert(both.count() > 0)
    assert(both.filter(!(col("native") <=> col("composed"))).count() === 0)
  }

  test("empty or all-null token arrays yield all-null signature slots") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("alpha", "beta"))
      .toDF("toks")
      .select(MinHash64.minhash64(col("toks"), 4).as("sig"))
    val rows = df.collect()
    assert(rows(0).getSeq[Any](0).forall(_ == null))
    assert(rows(1).getSeq[Any](0).forall(_ != null))
  }

  test("sql registration exposes minhash64(arr, k)") {
    MinHash64.register(spark)
    val r = spark.sql("SELECT minhash64(array('a','b'), 3) AS sig")
      .collect()(0).getSeq[Long](0)
    assert(r.length === 3)
  }
}
