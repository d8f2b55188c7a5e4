package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins `model_score`'s scoring semantics: the folded per-token weight
  * sum must equal the same model evaluated the expensive way (explode →
  * per-token weight → grouped SUM), be token-ORDER independent (a sum),
  * and classify by the documented thresholds. */
class ModelScoreSpec extends SparkTestBase {

  private def weightOf(tok: org.apache.spark.sql.Column) =
    (((element_at(DedupQueries.tokenHashes32(array(tok)), 1) % 256) * 37
      + 11) % 1001) - 500

  test("HOF fold equals the explode-path evaluation of the same model") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark native analytics engine"),
      (3L, "a b c d e f g 1 2 3"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("model_docs")

    val toks = array_remove(
      split(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+"), "")
    val folded = docs.select(col("doc_id"),
      aggregate(transform(DedupQueries.tokenHashes32(toks),
          v => (((v % 256) * 37 + 11) % 1001) - 500),
        lit(0L), (acc, w) => acc + w).as("score"))

    val exploded = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .select(col("doc_id"), weightOf(col("tok")).as("w"))
      .groupBy("doc_id").agg(sum(col("w")).cast(LongType).as("score"))

    val mismatches = folded.as("f")
      .join(exploded.as("e"), "doc_id")
      .filter(col("f.score") =!= col("e.score"))
      .count()
    assert(mismatches === 0L)
  }

  test("score is token-order independent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"))
      .toDF("doc_id", "text")
    val toks = array_remove(
      split(lower(col("text")), "[^a-z0-9]+"), "")
    val scores = docs.select(
      aggregate(transform(DedupQueries.tokenHashes32(toks),
          v => (((v % 256) * 37 + 11) % 1001) - 500),
        lit(0L), (acc, w) => acc + w).as("score"))
      .collect().map(_.getLong(0)).toSeq
    assert(scores(0) === scores(1))
  }

  test("registry query labels by threshold and handles empty/null text") {
    val out = TextQueries.modelScore.fn(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Long]("score")
      val expected =
        if (score > 200) "keep" else if (score > -200) "review" else "drop"
      assert(r.getAs[String]("label") === expected)
      if (r.getAs[Long]("n_toks") == 0L) assert(score === 0L)
    }
  }
}
