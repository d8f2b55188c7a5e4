package graft.ingest

import graft.schemas.Schemas.TableDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The "load" pass ≙ `loadcalaccessrawdata.py:~50-200` +
  * `managers.py:~10-60`: raw all-text columns → typed table.
  *
  * The reference stages text into a temp table then casts in
  * `INSERT…SELECT` (two phases because PostgreSQL COPY can't cast).
  * Spark needs no staging: the whole thing is ONE projection —
  * `CollapseProject` fuses it with the scan, and every rule below is a
  * codegen'd built-in expression (no UDFs; SURVEY §2.11):
  *
  *  - header rename UPPER → lower_snake (P7, mapping dict at `~90-120`)
  *  - '' → NULL (P3, `~120-150`)
  *  - `DATE_FIELDS` parsed M/d/yyyy with ISO yyyy-MM-dd fallback,
  *    garbage → NULL (P4, coalesced try_to_timestamp — real CAL-ACCESS
  *    exports mix both formats across vintages, SURVEY §2.11)
  *  - `DATETIME_FIELDS` parsed M/d/yyyy h:mm:ss a, ISO fallback (P5)
  *  - int/decimal casts with NULL-on-garbage try_cast semantics (P6)
  */
object Load {

  /** Per-vintage formats, first match wins. Order matters only for
    * strings both formats accept — there are none: M/d/yyyy rejects
    * `-`-separated dates and yyyy-MM-dd rejects `/`-separated ones, so
    * the coalesce is unambiguous. Each try_to_timestamp is a codegen'd
    * built-in; the coalesce stays one narrow projection (no UDF). */
  private val DateFmts = Seq("M/d/yyyy", "yyyy-MM-dd")
  private val DatetimeFmts = Seq("M/d/yyyy h:mm:ss a", "yyyy-MM-dd HH:mm:ss")

  /** ''→NULL then type coercion for one field — the per-column cast the
    * reference's generated INSERT…SELECT performs inside PostgreSQL. */
  private def coerce(table: TableDef, f: StructField): Column = {
    val raw = col(f.name.toUpperCase)
    val nulled = when(trim(raw) === "", lit(null)).otherwise(trim(raw))
    def multiFmt(fmts: Seq[String]): Column =
      coalesce(fmts.map(fmt => try_to_timestamp(nulled, lit(fmt))): _*)
    val typed = f.dataType match {
      case DateType if table.dateFields.contains(f.name) =>
        multiFmt(DateFmts).cast(DateType)
      case TimestampType if table.datetimeFields.contains(f.name) =>
        multiFmt(DatetimeFmts)
      case dt => nulled.try_cast(dt)
    }
    // keep help_text metadata on the loaded column (self-documentation is
    // part of the reference's contract — fields.py:~10-110)
    typed.as(f.name, f.metadata)
  }

  /** Typed projection: raw header-cased all-string frame → declared
    * schema. One narrow pass; no shuffle; fuses into the scan. */
  def load(table: TableDef, raw: DataFrame): DataFrame =
    raw.select(table.schema.fields.map(f => coerce(table, f)).toSeq: _*)

  /** Latest-amendment-wins dedup on the declared UNIQUE_KEY minus the
    * amendment counter (core CAL-ACCESS consumption semantics, SURVEY
    * §2.5 W1): for each logical record keep the max-amend_id row. */
  def latestAmendment(table: TableDef, typed: DataFrame,
      amendCol: String = "amend_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = table.uniqueKey.filterNot(_ == amendCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(amendCol).desc)
    typed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
