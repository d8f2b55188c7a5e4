package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted-index BM25 pins: the serving path must reproduce the
  * tokenize-on-read form row for row (same shared scoring tail, same
  * query terms), and the saved layout must earn its keep in the plan —
  * the term restriction reaches the posting-list scan as a PUSHED
  * parquet filter, and the scan reads only the posting columns. */
class Bm25ServeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Double]("score")))
      .sortBy(_._1).toSeq

  test("served BM25 equals the tokenize-on-read form row for row") {
    assert(rows("bm25_serve") === rows("bm25_search"))
  }

  test("term restriction is pushed into the posting-list scan") {
    val path = TextQueries.savedPostingsPath(spark, sf)
    val plan = spark.read.parquet(s"$path/lists")
      .where(col("term").isin("spark", "merge", "filter"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(term"), plan)
  }
}
