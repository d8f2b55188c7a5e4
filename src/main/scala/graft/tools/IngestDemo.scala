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

    val (good, badCount) =
      if (csvMode) {
        val res = CsvSource.scan(spark, table, path)
        (res.good, res.bad.count())
      } else {
        val res = Clean.cleanFile(spark, table, path)
        (res.good, res.bad.count())
      }
    val typed = Load.load(table, good)
    val latest = Load.latestAmendment(table, typed)

    println(s"[ingest] mode=${if (csvMode) "csv-source" else "line-clean"}")
    println(s"[ingest] good=${good.count()} bad=$badCount " +
      s"typed=${typed.count()} latest=${latest.count()}")
    val m = Tracking.forTable(table.name, Clean.cleanFile(spark, table, path),
      typed)
    println(s"[ingest] metrics=$m consistent=${m.consistent}")
    latest.orderBy("filing_id", "line_item").show(truncate = false)
    spark.stop()
  }
}
