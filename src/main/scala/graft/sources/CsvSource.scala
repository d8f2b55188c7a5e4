package graft.sources

import graft.schemas.Schemas.TableDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** §2.1 S3/S4: schema-declared delimited scan with a corrupt-record
  * side-channel — the datasource-level alternative to the line-level
  * `ingest.Clean` (use Clean when you need the reference's exact
  * field-count semantics; use this when the file is proper CSV/TSV).
  *
  * Implements the Spark caveat documented in SURVEY §4: the
  * `_corrupt_record` column cannot be filtered directly off a lazy CSV
  * relation (Spark raises AnalysisException / silently re-parses), so the
  * scanned frame is cached before the good/bad dual filter.
  */
object CsvSource {

  final case class ScanResult(good: DataFrame, bad: DataFrame,
      private val cached: DataFrame) {
    /** Release the cache backing the dual filter once consumed. */
    def unpersist(): Unit = { cached.unpersist(); () }
  }

  private val CorruptCol = "_corrupt_record"

  /** PERMISSIVE scan of `path` against the declared raw schema; rows that
    * fail parsing land in the corrupt-record column and are routed to
    * `bad` (original line preserved), everything else to `good`. */
  def scan(spark: SparkSession, table: TableDef, path: String,
      sep: String = "\t", header: Boolean = true): ScanResult = {
    val withCorrupt = StructType(
      table.rawSchema.fields :+ StructField(CorruptCol, StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("sep", sep)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
      .cache() // required: corrupt-record dual filter needs a stable scan
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("line"))
    ScanResult(good, bad, raw)
  }
}
