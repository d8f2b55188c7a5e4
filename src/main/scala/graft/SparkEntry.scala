package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The registry is assembled from per-category modules under `graft.ops`;
  * each `GQuery` pairs the Spark implementation with its DuckDB oracle so
  * names/columns can never drift apart.
  */
object SparkEntry {

  def registry: Seq[GQuery] =
    ops.CoreQueries.all ++ ops.JoinQueries.all ++ ops.AggQueries.all ++
      ops.WindowQueries.all ++ ops.SortSetQueries.all ++
      ops.ScalarQueries.all ++ ops.StreamQueries.all ++
      ops.FunnelQueries.all ++ ops.EpochTable.all ++
      ops.TextQueries.all ++ ops.EpochPostings.all ++
      ops.BoolQueries.all ++
      ops.PhraseQueries.all ++ ops.EpochPositional.all ++
      ops.Suggest.all ++ ops.EpochSuggest.all ++
      ops.CorpusQueries.all ++
      ops.VectorQueries.all ++ ops.HybridQueries.all ++
      ops.DedupQueries.all ++ ops.NearDup.all ++ ops.EpochNearDup.all ++
      ops.IndexStats.all ++
      ops.Multimodal.all ++ ops.IncrQueries.all ++ ops.Takedown.all ++
      ops.Maintenance.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.CoreQueries.q1Pricing.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
