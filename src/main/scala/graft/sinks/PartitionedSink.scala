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

  /** Z-order compaction: rewrite a table into size-targeted parquet
    * files clustered on the z-curve of two dimensions, so every file's
    * footer min/max stats are TIGHT ON BOTH columns and any engine's
    * row-group/file skipping prunes 2-D predicates (the physical form
    * of the `zorder_layout` query's claim; see
    * `graft.ops.IncrQueries.zvalue`).
    *
    * Mechanics: compute z, range-partition into
    * ceil(rows / targetRecordsPerFile) contiguous z-ranges,
    * sortWithinPartitions(z) so row groups inside a file are clustered
    * too, and write one file per partition. This is also the
    * small-files compaction pass: a directory of K tiny files rewrites
    * into ceil(n/target) right-sized ones in one shuffle.
    *
    * The row count drives the partition count, so the caller pays ONE
    * count() job before the shuffle — the price of deterministic file
    * sizing (AQE coalescing would size by bytes but not give the
    * per-file z-contiguity this sink exists for).
    *
    * `ZCompactSpec` pins the contract on the written files: file count,
    * per-file z-range disjointness, and per-file bounding boxes tight
    * on BOTH dimensions (vs full-domain spans for an unclustered
    * write). */
  def compactZOrdered(df: DataFrame, path: String,
      xCol: String, yCol: String,
      targetRecordsPerFile: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val z = graft.ops.IncrQueries.zvalue(col(xCol), col(yCol))
    val withZ = df.withColumn("_z", z)
    val n = withZ.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRecordsPerFile)
      .toInt)
    withZ
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(path)
  }
}
