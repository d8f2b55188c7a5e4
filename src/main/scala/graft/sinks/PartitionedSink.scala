package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.1 S5 at scale: columnar sinks laid out for downstream access
  * patterns. The reference bulk-COPYs into heap tables and relies on
  * b-tree indexes; the Spark-native equivalents are:
  *
  *  - **partitionBy**: hive-style directory partitioning on coarse
  *    filter columns (e.g. form_type / filing year) → partition pruning
  *    turns WHEREs into directory skips. Keep cardinality modest
  *    (≤ thousands of partitions).
  *  - **bucketBy**: pre-shuffled, pre-sorted table layout on a join key
  *    (e.g. FILING_ID) → bucketed joins between co-bucketed tables skip
  *    the exchange entirely. Requires saveAsTable (metastore-tracked).
  */
object PartitionedSink {

  /** Partitioned parquet write (path-based; pruning-friendly). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted managed table (exchange-free co-located joins). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a partitioned path (pruning visible in the scan's
    * PartitionFilters when filtered on the partition column). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
