package graft.ingest

import graft.SparkTestBase
import graft.schemas.Schemas
import org.apache.spark.sql.functions._

/** P5 datetime coercion: DATETIME_FIELDS parsed `M/d/yyyy h:mm:ss a`
  * with ISO fallback, garbage → NULL (loadcalaccessrawdata.py:~130-170
  * semantics; real exports mix vintages, SURVEY §2.11). */
class DatetimeLoadSpec extends SparkTestBase {

  // Build raw filername_cd lines positionally from the declared schema
  // so the tests survive schema widening: every field empty except the
  // ones set.
  private def fnLine(xref: String, filerId: String, naml: String,
      effectDt: String): String = {
    val table = Schemas.filernameCd
    val idx = table.schema.fieldNames.zipWithIndex.toMap
    val fields = Array.fill(table.schema.length)("")
    fields(idx("xref_filer_id")) = xref
    fields(idx("filer_id")) = filerId
    fields(idx("filer_type")) = "COM"
    fields(idx("status")) = "A"
    fields(idx("naml")) = naml
    fields(idx("effect_dt")) = effectDt
    fields.mkString("\t")
  }

  test("M/d/yyyy h:mm:ss a datetimes parse; garbage coerces to NULL") {
    import spark.implicits._
    val table = Schemas.filernameCd
    val lines = Seq(
      fnLine("X1", "100", "DOE", "1/15/2014 9:30:00 AM"),
      fnLine("X2", "200", "PAC TWO", "12/31/2013 11:59:59 PM"),
      fnLine("X3", "300", "BAD TS", "not a timestamp"),
      fnLine("X4", "400", "EMPTY TS", "")).toDF("value")
    val typed = Load.load(table, Clean.clean(table, lines).good)
    val rows = typed.orderBy("filer_id")
      .select(col("filer_id"), col("effect_dt").cast("string"))
      .collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq === Seq(
      Some("2014-01-15 09:30:00"),
      Some("2013-12-31 23:59:59"),
      None,
      None))
  }

  test("mixed-vintage file: ISO datetimes parse via the fallback format") {
    import spark.implicits._
    val table = Schemas.filernameCd
    val lines = Seq(
      fnLine("Y1", "100", "US VINTAGE", "1/15/2014 9:30:00 AM"),
      fnLine("Y2", "200", "ISO VINTAGE", "2014-01-15 09:30:00"),
      fnLine("Y3", "300", "ISO MIDNIGHT", "2013-12-31 00:00:00"),
      fnLine("Y4", "400", "HALF ISO", "2014-01-15")).toDF("value")
    val typed = Load.load(table, Clean.clean(table, lines).good)
    val rows = typed.orderBy("filer_id")
      .select(col("filer_id"), col("effect_dt").cast("string"))
      .collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq === Seq(
      Some("2014-01-15 09:30:00"),
      Some("2014-01-15 09:30:00"), // same instant, either vintage
      Some("2013-12-31 00:00:00"),
      None)) // date-only string is not a valid datetime in either format
  }

  test("mixed-vintage date fields: M/d/yyyy and yyyy-MM-dd both parse") {
    import spark.implicits._
    val table = Schemas.rcptCd
    // Build raw lines positionally from the declared schema so the test
    // survives schema widening: every field empty except the ones set.
    val idx = table.schema.fieldNames.zipWithIndex.toMap
    def line(tran: String, date: String): String = {
      val fields = Array.fill(table.schema.length)("")
      fields(idx("filing_id")) = "1001"
      fields(idx("amend_id")) = "0"
      fields(idx("tran_id")) = tran
      fields(idx("rcpt_date")) = date
      fields.mkString("\t")
    }
    val lines = Seq(
      line("T1", "1/15/2014"),
      line("T2", "2014-01-15"),
      line("T3", "2014-02-30"), // invalid in ISO too → NULL
      line("T4", "31/12/2013")  // M/d/yyyy rejects month 31 → NULL
    ).toDF("value")
    val typed = Load.load(table, Clean.clean(table, lines).good)
    val rows = typed.orderBy("tran_id")
      .select(col("tran_id"), col("rcpt_date").cast("string"))
      .collect()
    assert(rows.map(r => Option(r.getString(1))).toSeq === Seq(
      Some("2014-01-15"),
      Some("2014-01-15"),
      None,
      None))
  }
}
