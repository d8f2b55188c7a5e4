package graft.tools

import graft.SparkEntry

/** Plan auditor: prints the formatted physical plan for selected queries
  * so scan pushdown, broadcast choices, and codegen spans can be reviewed
  * (SURVEY §4 — "verify with explain() in tests").
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("filter_pred", "join_broadcast", "join_star", "q1_pricing",
        "topk", "topk_group", "win_latest", "dedup_minhash_lsh",
        "bucketed_join", "line_dedup", "corpus_clean", "fuzzy_match",
        "scd2_merge", "funnel",
        // round 12: the retrieval/serving tier — bm25_serve must show
        // the pushed In(term) filter, knn_join_pq the codes-only scan,
        // agg_pushdown the PushedAggregation metadata pass
        "bm25_search", "bm25_serve", "knn_join_pq", "agg_pushdown",
        "incr_pipeline")
    // r20: honor the bench's core-count env var so plans whose shape is
    // deliberately parallelism-adaptive (Fan.out) can be audited at the
    // same core count the bench runs with; default stays 4.
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt,
      "graft-explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
