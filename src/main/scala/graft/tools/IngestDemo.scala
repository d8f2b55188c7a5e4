package graft.tools

import graft.ingest.{Clean, Load}
import graft.meta.Tracking
import graft.schemas.Schemas
import graft.sources.CsvSource
import org.apache.spark.sql.SparkSession

/** End-to-end ingest demo ≙ one `updatecalaccessrawdata` table cycle:
  * scan → clean split → typed load → latest-amendment view → metrics.
  *
  * Usage: runMain graft.tools.IngestDemo <tsvPath> [csvMode]
  * With `csvMode`, uses the datasource-level CsvSource instead of the
  * line-level Clean for the scan stage.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "src/test/resources/rcpt_cd_sample.tsv")
    val csvMode = args.length > 1
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val table = Schemas.rcptCd

    if (csvMode) {
      val res = CsvSource.scan(spark, table, path)
      val typed = Load.load(table, res.good)
      println(s"[ingest] mode=csv-source good=${res.good.count()} " +
        s"bad=${res.bad.count()} typed=${typed.count()}")
    } else {
      // the orchestrated path: clean → load → parquet sink → verified
      // metrics, exactly what a full update run does per table
      val outDir = java.nio.file.Files
        .createTempDirectory("ingest_demo").toString
      val result = graft.Pipeline.updateTable(spark, table, path, outDir)
      val latest = Load.latestAmendment(table, result.typed)
      println(s"[ingest] mode=pipeline out=$outDir")
      println(s"[ingest] metrics=${result.metrics} " +
        s"consistent=${result.metrics.consistent} latest=${latest.count()}")
      latest.orderBy("filing_id", "line_item").show(truncate = false)
    }
    spark.stop()
  }
}
