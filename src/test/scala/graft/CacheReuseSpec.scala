package graft

import org.apache.spark.sql.functions._

/** §4 optimizer surface: a persisted intermediate is served from the
  * in-memory columnar cache by EVERY downstream query — the idiom for
  * iterative workloads (a cleaned table feeding many aggregations, a
  * candidate-pair table feeding verify + cluster stages). The pin is on
  * the plan (InMemoryTableScan), not timing, so it can't flake. */
class CacheReuseSpec extends SparkTestBase {

  test("a cached intermediate serves multiple downstream plans") {
    val cleaned = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tok"))
      .persist()
    try {
      cleaned.count() // materialize
      val q1 = cleaned.groupBy("lang").agg(avg("n_tok"))
      val q2 = cleaned.filter(col("n_tok") > 10).agg(count(lit(1)))
      Seq(q1, q2).foreach { q =>
        // the leaf serving the query must be the cache scan (the plan
        // dump also prints the InMemoryRelation's BUILD subtree, which
        // legitimately mentions the original FileScan — that's the
        // cache's definition, not a re-read)
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("InMemoryTableScan"), plan)
      }
      assert(q1.count() > 0 && q2.head().getLong(0) > 0)
    } finally cleaned.unpersist()
  }
}
