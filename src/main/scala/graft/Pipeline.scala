package graft

import graft.ingest.{Clean, Load}
import graft.meta.Tracking
import graft.meta.Tracking.FileMetrics
import graft.schemas.Schemas.TableDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline orchestrator ≙ `updatecalaccessrawdata` (SURVEY §3.1): for
  * each registered table — clean → typed load → columnar sink → verified
  * metrics row. The reference runs tables sequentially
  * (`updatecalaccessrawdata.py:~100-200`); here the per-table loop is the
  * parallelism seam: jobs are submitted concurrently (Spark's scheduler
  * interleaves their tasks across the executor pool), and within each
  * table the work is partition-parallel.
  *
  * Stage mapping (reference → here):
  *   download/extract (S1/S2)  → driver-side prep, see sources.Archive
  *   clean (stage 5)           → ingest.Clean (split + scrub)
  *   load (stage 6)            → ingest.Load (typed projection)
  *   bulk sink (S5)            → parquet write (columnar at rest)
  *   verify (stage 7)          → Tracking.FileMetrics.consistent
  */
object Pipeline {

  final case class TableResult(
      table: String,
      typed: DataFrame,
      metrics: FileMetrics)

  /** One table cycle: clean → load → write → count-verified metrics. */
  def updateTable(spark: SparkSession, table: TableDef, tsvPath: String,
      outDir: String): TableResult = {
    val cleaned = Clean.cleanFile(spark, table, tsvPath)
    val typed = Load.load(table, cleaned.good)
    typed.write.mode("overwrite").parquet(s"$outDir/${table.name}.parquet")
    Clean.writeCleaned(cleaned, outDir, table.name)
    val loadedBack = spark.read.parquet(s"$outDir/${table.name}.parquet")
    val metrics = Tracking.forTable(table.name, cleaned, loadedBack)
    TableResult(table.name, loadedBack, metrics)
  }

  /** Full update run over many tables, concurrent job submission. */
  def update(spark: SparkSession, tables: Seq[(TableDef, String)],
      outDir: String): Seq[TableResult] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futures = tables.map { case (t, path) =>
      Future(updateTable(spark, t, path, outDir))
    }
    Await.result(Future.sequence(futures), Duration.Inf)
  }

  /** ≙ verifycalaccessrawdata: true iff every table's counts line up. */
  def verify(results: Seq[TableResult]): Boolean =
    results.forall(_.metrics.consistent)
}
