package graft.schemas

import org.apache.spark.sql.types._

/** Schema registry ≙ the reference's model layer.
  *
  * The reference declares ~80 fixed-schema tables as Django models
  * (`calaccess_raw/models/<module>.py`), each mapping a CAL-ACCESS `.TSV` 1:1,
  * with a mandatory `UNIQUE_KEY` (`models/base.py:~34`) and per-field
  * `help_text` documentation enforced by tests (`fields.py:~10-110`,
  * `tests/test_models.py:~1-200`). Here a table is a `TableDef`: explicit
  * `StructType` (never inferred — SURVEY §1.1), the declared unique key,
  * date/datetime field lists driving load-time coercion
  * (`models/base.py:~35-36`), and docs carried in `Metadata`.
  *
  * Only representative tables are registered (the shape class, per SURVEY
  * §1.3): the biggest fact (`rcpt_cd` ≙ `RcptCd`, `models/campaign.py:
  * ~1800`), the link table (`filer_filings_cd` ≙ `FilerFilingsCd`,
  * `models/common.py:~200`), and a lookup dimension (`lookup_codes_cd` ≙
  * `LookupCodesCd`, `models/inactive.py:~400`).
  */
object Schemas {

  final case class TableDef(
      name: String,
      schema: StructType,
      uniqueKey: Seq[String],
      dateFields: Seq[String] = Nil,
      datetimeFields: Seq[String] = Nil) {
    /** Raw-side schema: every column as text, header-cased — what the TSV
      * scan produces before the load projection types it. */
    def rawSchema: StructType =
      StructType(schema.fields.map(f =>
        StructField(f.name.toUpperCase, StringType, nullable = true)))
  }

  private def doc(s: String): Metadata =
    new MetadataBuilder().putString("help_text", s).build()

  /** ≙ RCPT_CD — itemized receipts, the biggest CAL-ACCESS table
    * (~10M rows; `models/campaign.py:~1800`). Subset of the ~50 columns. */
  val rcptCd: TableDef = TableDef(
    name = "rcpt_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the transaction, always RCPT")),
      StructField("form_type", StringType, nullable = true,
        doc("Schedule of the form on which the receipt is reported")),
      StructField("tran_id", StringType, nullable = true,
        doc("Permanent value unique within the filing")),
      StructField("entity_cd", StringType, nullable = true,
        doc("Entity code of the contributor (IND, COM, OTH, PTY, SCC)")),
      StructField("ctrib_naml", StringType, nullable = true,
        doc("Contributor last name")),
      StructField("ctrib_namf", StringType, nullable = true,
        doc("Contributor first name")),
      StructField("ctrib_city", StringType, nullable = true,
        doc("Contributor city")),
      StructField("ctrib_st", StringType, nullable = true,
        doc("Contributor state")),
      StructField("ctrib_zip4", StringType, nullable = true,
        doc("Contributor ZIP+4")),
      StructField("rcpt_date", DateType, nullable = true,
        doc("Date the receipt was received, M/D/YYYY in the raw file")),
      StructField("amount", DecimalType(14, 2), nullable = true,
        doc("Amount received")),
      StructField("cum_ytd", DecimalType(14, 2), nullable = true,
        doc("Cumulative year-to-date amount")),
      StructField("memo_code", StringType, nullable = true,
        doc("Memo amount flag")),
      StructField("cmte_id", StringType, nullable = true,
        doc("Committee identification number")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("rcpt_date"))

  /** ≙ FILER_FILINGS_CD — filer↔filing link with amendment sequence
    * (`models/common.py:~200`). */
  val filerFilingsCd: TableDef = TableDef(
    name = "filer_filings_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer unique identification number")),
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("period_id", LongType, nullable = true,
        doc("Identifies the period the filing covers")),
      StructField("form_id", StringType, nullable = true,
        doc("Form identification code")),
      StructField("filing_sequence", LongType, nullable = true,
        doc("Amendment number; 0 original, 1+ amendments")),
      StructField("filing_date", DateType, nullable = true,
        doc("Date the filing was filed, M/D/YYYY in the raw file")),
      StructField("stmnt_type", LongType, nullable = true,
        doc("Statement type")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session the filing applies to")))),
    uniqueKey = Seq("filer_id", "filing_id", "filing_sequence"),
    dateFields = Seq("filing_date"))

  /** ≙ LOOKUP_CODES_CD — the dimension/decode table
    * (`models/inactive.py:~400`). */
  val lookupCodesCd: TableDef = TableDef(
    name = "lookup_codes_cd",
    schema = StructType(Seq(
      StructField("code_type", LongType, nullable = true,
        doc("Type of code listed")),
      StructField("code_id", LongType, nullable = true,
        doc("Numeric code value")),
      StructField("code_desc", StringType, nullable = true,
        doc("Code description")))),
    uniqueKey = Seq("code_type", "code_id"))

  /** ≙ SMRY_CD — per-filing summary totals (`models/common.py:~500`). */
  val smryCd: TableDef = TableDef(
    name = "smry_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", StringType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type, always SMRY")),
      StructField("form_type", StringType, nullable = true,
        doc("Name of the summarized form or schedule")),
      StructField("amount_a", DecimalType(16, 2), nullable = true,
        doc("Summary amount from column A")),
      StructField("amount_b", DecimalType(16, 2), nullable = true,
        doc("Summary amount from column B")),
      StructField("amount_c", DecimalType(16, 2), nullable = true,
        doc("Summary amount from column C")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"))

  /** ≙ FILERNAME_CD — the filer directory (`models/common.py`), carries a
    * datetime column exercising the P5 `M/d/yyyy h:mm:ss a` coercion. */
  val filernameCd: TableDef = TableDef(
    name = "filername_cd",
    schema = StructType(Seq(
      StructField("xref_filer_id", StringType, nullable = true,
        doc("Crossreference filer identification number")),
      StructField("filer_id", LongType, nullable = true,
        doc("Filer unique identification number")),
      StructField("filer_type", StringType, nullable = true,
        doc("Type of the filer entity")),
      StructField("status", StringType, nullable = true,
        doc("Filer status (A active, …)")),
      StructField("naml", StringType, nullable = true,
        doc("Last name or full organization name")),
      StructField("namf", StringType, nullable = true,
        doc("First name")),
      StructField("effect_dt", TimestampType, nullable = true,
        doc("Effective datetime of the name record, " +
          "M/D/YYYY H:MM:SS AM in the raw file")))),
    uniqueKey = Seq("filer_id", "naml", "effect_dt"),
    datetimeFields = Seq("effect_dt"))

  /** ≙ EXPN_CD — itemized expenditures (`models/campaign.py`), the second
    * big fact table; same shape class as rcpt_cd. */
  val expnCd: TableDef = TableDef(
    name = "expn_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type, always EXPN")),
      StructField("form_type", StringType, nullable = true,
        doc("Schedule of the form on which the expense is reported")),
      StructField("payee_naml", StringType, nullable = true,
        doc("Payee last name or organization name")),
      StructField("payee_city", StringType, nullable = true,
        doc("Payee city")),
      StructField("expn_date", DateType, nullable = true,
        doc("Date of the expenditure, M/D/YYYY in the raw file")),
      StructField("amount", DecimalType(14, 2), nullable = true,
        doc("Amount paid to the payee")),
      StructField("expn_code", StringType, nullable = true,
        doc("Expense code from the lookup-code domain")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("expn_date"))

  val all: Seq[TableDef] =
    Seq(rcptCd, filerFilingsCd, lookupCodesCd, smryCd, filernameCd, expnCd)

  def byName(name: String): TableDef =
    all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown table: $name"))
}
