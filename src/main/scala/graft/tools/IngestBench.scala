package graft.tools

import graft.Pipeline
import graft.schemas.Schemas.TableDef
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest throughput benchmark ≙ the reference's core workload: bulk
  * TSV → clean → typed load → columnar sink (its COPY-bound path,
  * ~36M rows in ~30min–hours single-node per BASELINE.md ⇒ roughly
  * 10–20k rows/s). Exports lineitem as a real TSV first (not counted),
  * then times the full pipeline cycle and prints one JSON line with
  * rows/sec.
  *
  * Usage: runMain graft.tools.IngestBench [sfDir]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tdef = TableDef(
      name = "lineitem_raw",
      schema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_linenumber", LongType),
        StructField("l_quantity", DecimalType(14, 2)),
        StructField("l_extendedprice", DecimalType(14, 2)),
        StructField("l_returnflag", StringType),
        StructField("l_shipdate", DateType))),
      uniqueKey = Seq("l_orderkey", "l_linenumber"),
      dateFields = Seq("l_shipdate"))

    // prep (uncounted): materialize a real TSV export of lineitem
    val tsvDir = java.nio.file.Files.createTempDirectory("ingest_tsv").toString
    val li = Tables.lineitem(spark, sfDir)
    li.select(concat_ws("\t",
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"),
        date_format(col("l_shipdate"), "M/d/yyyy")).as("value"))
      .write.mode("overwrite").text(tsvDir)
    val nRows = li.count()

    val outDir = java.nio.file.Files.createTempDirectory("ingest_out").toString
    val t0 = System.nanoTime()
    val result = Pipeline.updateTable(spark, tdef, tsvDir, outDir)
    val secs = (System.nanoTime() - t0) / 1e9
    val rps = (nRows / secs).toLong
    require(result.metrics.consistent && result.metrics.loadRecords == nRows,
      s"ingest bench inconsistent: ${result.metrics}")
    println(s"""{"metric":"ingest_rows_per_sec","value":$rps,"unit":"rows/sec","rows":$nRows,"secs":$secs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
