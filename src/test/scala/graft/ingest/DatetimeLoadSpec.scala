package graft.ingest

import graft.SparkTestBase
import graft.schemas.Schemas
import org.apache.spark.sql.functions._

/** P5 datetime coercion: DATETIME_FIELDS parsed `M/d/yyyy h:mm:ss a`,
  * garbage → NULL (loadcalaccessrawdata.py:~130-170 semantics). */
class DatetimeLoadSpec extends SparkTestBase {

  test("M/d/yyyy h:mm:ss a datetimes parse; garbage coerces to NULL") {
    import spark.implicits._
    val table = Schemas.filernameCd
    val lines = Seq(
      "X1\t100\tCAND\tA\tDOE\tJANE\t1/15/2014 9:30:00 AM",
      "X2\t200\tCOM\tA\tPAC TWO\t\t12/31/2013 11:59:59 PM",
      "X3\t300\tCOM\tA\tBAD TS\t\tnot a timestamp",
      "X4\t400\tCOM\tA\tEMPTY TS\t\t").toDF("value")
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
}
