package graft.meta

import graft.schemas.Schemas.TableDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Documented-code annotations ≙ the reference's annotations layer
  * (`annotations/__init__.py:~60` `get_sorted_choices`,
  * `annotations/filing_forms.py`): the registry of what each closed code
  * set MEANS — per (table, column) choice lists and the filing-form
  * directory — kept as data, not as inline literals scattered through
  * queries, so every decode in the engine reads the same source of
  * truth.
  *
  * Two decode shapes, both registry-driven:
  *  - [[decodeExpr]]: a `when()` chain built from the choice list —
  *    constant-folded into the scan, zero joins; right for the tiny
  *    closed sets these are.
  *  - [[choicesDf]] + broadcast join: the table-driven form
  *    (`decode_registry` in the query registry uses it) — right when
  *    the code set is large or shared across many queries, and the
  *    100 TB shape for a dimension that outgrows a codegen'd CASE.
  *
  * The seeded content mirrors the reference's documented CAL-ACCESS
  * sets (entity codes, active flags, status types) plus the testdata
  * analogs the correctness gate exercises; the lists are data — adding
  * one is a one-line seed, no engine change.
  */
object Annotations {

  /** One documented code → meaning pair (≙ a Django `choices` tuple). */
  final case class Choice(code: String, meaning: String)

  /** One filing form (≙ `annotations/filing_forms.py` FilingForm). */
  final case class FilingForm(id: String, title: String,
      sections: Seq[String] = Nil)

  /** (table, column) → documented choices. */
  val choices: Map[(String, String), Seq[Choice]] = Map(
    // ≙ models/campaign.py entity_cd choices, shared by every
    // itemization table
    ("rcpt_cd", "entity_cd") -> Seq(
      Choice("COM", "Committee"),
      Choice("IND", "Individual"),
      Choice("OTH", "Other"),
      Choice("PTY", "Political party"),
      Choice("SCC", "Small contributor committee")),
    ("expn_cd", "entity_cd") -> Seq(
      Choice("COM", "Committee"),
      Choice("IND", "Individual"),
      Choice("OTH", "Other"),
      Choice("PTY", "Political party"),
      Choice("SCC", "Small contributor committee")),
    ("filer_to_filer_type_cd", "active") -> Seq(
      Choice("N", "No"),
      Choice("Y", "Yes")),
    ("filer_status_types_cd", "status_type") -> Seq(
      Choice("A", "Active"),
      Choice("P", "Pending"),
      Choice("R", "Revoked"),
      Choice("S", "Suspended"),
      Choice("T", "Terminated"),
      Choice("W", "Withdrawn")),
    // testdata analogs: the closed sets the correctness gate decodes
    ("lineitem", "l_returnflag") -> Seq(
      Choice("A", "ACCEPTED"),
      Choice("N", "NONE"),
      Choice("R", "RETURNED")),
    ("lineitem", "l_linestatus") -> Seq(
      Choice("F", "FILED"),
      Choice("O", "OPEN")))

  /** Choices for one column, sorted by code — ≙ `get_sorted_choices`
    * (the reference sorts so docs and admin render deterministically). */
  def sortedChoices(table: String, column: String): Seq[Choice] =
    choices.getOrElse((table, column),
      throw new IllegalArgumentException(
        s"no documented choices for $table.$column"))
      .sortBy(_.code)

  /** The filing-form directory (≙ `annotations/filing_forms.py`): id,
    * title, and the itemization sections the form carries. */
  val filingForms: Seq[FilingForm] = Seq(
    FilingForm("F400", "Statement of Organization (Slate Mailer Organization)"),
    FilingForm("F401", "Slate Mailer Organization Campaign Statement",
      Seq("A", "B", "C", "D")),
    FilingForm("F410", "Statement of Organization Recipient Committee"),
    FilingForm("F425", "Semi-Annual Statement of No Activity"),
    FilingForm("F450",
      "Recipient Committee Campaign Disclosure Statement - Short Form",
      Seq("P")),
    FilingForm("F460", "Recipient Committee Campaign Statement",
      Seq("A", "B1", "C", "D", "E", "F", "G", "H", "I")),
    FilingForm("F461",
      "Independent Expenditure Committee & Major Donor Committee Campaign Statement",
      Seq("P5")),
    FilingForm("F465", "Supplemental Independent Expenditure Report"),
    FilingForm("F496", "Late Independent Expenditure Report"),
    FilingForm("F497", "Late Contribution Report", Seq("P1", "P2")),
    FilingForm("F498", "Slate Mailer Late Payment Report"),
    FilingForm("F601", "Lobbying Firm Registration Statement"),
    FilingForm("F602", "Lobbying Firm Activity Authorization"),
    FilingForm("F603",
      "Lobbyist Employer/Lobbying Coalition Registration Statement"),
    FilingForm("F604", "Lobbyist Certification Statement"),
    FilingForm("F605",
      "Amendment to Registration, Lobbying Firm, Lobbyist Employer, Lobbying Coalition"),
    FilingForm("F606", "Notice of Termination"),
    FilingForm("F607", "Notice of Withdrawal"),
    FilingForm("F615", "Lobbyist Report"),
    FilingForm("F625", "Report of Lobbying Firm"),
    FilingForm("F635",
      "Report of Lobbyist Employer and Report of Lobbying Coalition"),
    FilingForm("F645", "Report of Person Spending $5,000 or More"))

  def formById(id: String): FilingForm =
    filingForms.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"unknown filing form: $id"))

  /** The seeded choices DIMENSION — schema declared like any catalog
    * table so sinks/loaders treat it uniformly; rows come from the
    * registry, not a file. */
  val choiceCodesDef: TableDef = TableDef(
    name = "choice_codes",
    schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false,
        new MetadataBuilder()
          .putString("help_text", "Catalog table the code appears in")
          .build()),
      StructField("column_name", StringType, nullable = false,
        new MetadataBuilder()
          .putString("help_text", "Column carrying the code").build()),
      StructField("code", StringType, nullable = false,
        new MetadataBuilder()
          .putString("help_text", "Raw code value as filed").build()),
      StructField("meaning", StringType, nullable = false,
        new MetadataBuilder()
          .putString("help_text", "Documented meaning of the code")
          .build()))),
    uniqueKey = Seq("table_name", "column_name", "code"))

  /** Registry → DataFrame, ordered (table, column, code) — a bounded
    * driver-seeded dimension, the broadcast side of any decode join. */
  def choicesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    choices.toSeq
      .flatMap { case ((t, c), cs) => cs.map(ch => (t, c, ch.code, ch.meaning)) }
      .sorted
      .toDF("table_name", "column_name", "code", "meaning")
  }

  /** Filing-form directory → DataFrame (sections joined for scalar
    * hashing). */
  def formsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    filingForms.map(f => (f.id, f.title, f.sections.mkString(",")))
      .toDF("form_id", "title", "sections")
  }

  /** Join-free decode: when() chain from the registry, ELSE `fallback`.
    * Constant-folded into the scan — the right shape for closed sets of
    * a few codes. */
  def decodeExpr(table: String, column: String, raw: Column,
      fallback: String = "UNKNOWN"): Column =
    sortedChoices(table, column)
      .foldLeft(None: Option[Column]) { (acc, ch) =>
        Some(acc match {
          case None => when(raw === ch.code, ch.meaning)
          case Some(w) => w.when(raw === ch.code, ch.meaning)
        })
      }
      .get.otherwise(fallback)

  /** The same decode as a DuckDB VALUES fragment — oracle SQL for any
    * registry-driven decode derives from HERE, so Spark and the oracle
    * can never disagree about a code's documented meaning. */
  def valuesSql(table: String, column: String): String =
    sortedChoices(table, column)
      .map(c => s"('${c.code.replace("'", "''")}', " +
        s"'${c.meaning.replace("'", "''")}')")
      .mkString(", ")
}
