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
  * The registry covers four tiers (SURVEY §1.3): the shape classes — the
  * biggest fact (`rcpt_cd` ≙ `RcptCd`, `models/campaign.py:~1800`), the
  * link table (`filer_filings_cd` ≙ `FilerFilingsCd`, `models/common.py:
  * ~200`), a lookup dimension (`lookup_codes_cd` ≙ `LookupCodesCd`,
  * `models/inactive.py:~400`) — plus the next tier of high-traffic
  * campaign/lobbying tables (cover pages, loans, debts, late reports,
  * lobbying payments/expenses, filer links) — plus a third tier: the
  * filings backbone (`filings_cd`, `hdr_cd`, `text_memo_cd`), schedule
  * itemizations (S401/S496/S498/splits), lobbying registration, lookup
  * dimensions, and the tracking/lineage star (`raw_data_version`,
  * `raw_data_file` ≙ `models/tracking.py`) — and a fourth: candidate
  * filings (F501/502), CVR2 continuation pages, the lobbyist directory
  * family, cross-reference/address/name directories, and remaining
  * dimensions. The four headline tables (`rcpt_cd`, `expn_cd`,
  * `cvr_campaign_disclosure_cd`, `filer_filings_cd`) carry their FULL
  * declared column sets in raw-TSV order, so any real reference query
  * resolves; the deep tiers carry every documented
  * record block (round 18 widened the CVR2 continuation pages and the
  * F501/502 candidate-intention table to their documented field sets);
  * raw columns whose names public memory cannot pin are omitted rather
  * than guessed (SURVEY §0) — widening a TableDef stays additive and
  * needs no engine change.
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

  // Compact field constructors for the full-width headline tables (the
  // reference declares every TSV column with help_text; these keep that
  // declaration one line per field).
  private def str(n: String, d: String): StructField =
    StructField(n, StringType, nullable = true, doc(d))
  private def lng(n: String, d: String): StructField =
    StructField(n, LongType, nullable = true, doc(d))
  private def date(n: String, d: String): StructField =
    StructField(n, DateType, nullable = true, doc(d))
  private def money(n: String, d: String): StructField =
    StructField(n, DecimalType(14, 2), nullable = true, doc(d))
  private def money16(n: String, d: String): StructField =
    StructField(n, DecimalType(16, 2), nullable = true, doc(d))

  /** ≙ RCPT_CD — itemized receipts, the biggest CAL-ACCESS table
    * (~10M rows; `models/campaign.py:~1800`). FULL declared column set in
    * raw-TSV order, reconstructed from the public CAL-ACCESS file
    * documentation (the on-disk reference is empty — SURVEY §0), so a
    * real query against any `RcptCd` field (`tran_id`, `intr_naml`, …)
    * resolves here exactly as it does in the reference. */
  val rcptCd: TableDef = TableDef(
    name = "rcpt_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always RCPT"),
      str("form_type", "Schedule of the form on which the receipt is reported"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the contributor (documented set in meta.Annotations: BNM, CAO, COM, CTL, IND, MDI, OFF, OTH, PTY, RCP, SCC, SMO)"),
      str("ctrib_naml", "Contributor last name or organization name"),
      str("ctrib_namf", "Contributor first name"),
      str("ctrib_namt", "Contributor name title or prefix"),
      str("ctrib_nams", "Contributor name suffix"),
      str("ctrib_city", "Contributor city"),
      str("ctrib_st", "Contributor state"),
      str("ctrib_zip4", "Contributor ZIP+4"),
      str("ctrib_emp", "Contributor employer"),
      str("ctrib_occ", "Contributor occupation"),
      str("ctrib_self", "Is the contributor self-employed? (y/n)"),
      str("tran_type", "Transaction type (T return, F forgiven loan, ...)"),
      date("rcpt_date", "Date the receipt was received, M/D/YYYY in the raw file"),
      date("date_thru", "End of date range the receipt was received, M/D/YYYY"),
      money("amount", "Amount received in the period of the statement"),
      money("cum_ytd", "Cumulative year-to-date amount from this contributor"),
      money("cum_oth", "Cumulative other (F401 second total) amount"),
      str("ctrib_dscr", "Description of a non-monetary contribution"),
      str("cmte_id", "Committee identification number of the recipient"),
      str("tres_naml", "Treasurer or responsible officer last name"),
      str("tres_namf", "Treasurer or responsible officer first name"),
      str("tres_namt", "Treasurer or responsible officer name title"),
      str("tres_nams", "Treasurer or responsible officer name suffix"),
      str("tres_city", "Treasurer or responsible officer city"),
      str("tres_st", "Treasurer or responsible officer state"),
      str("tres_zip4", "Treasurer or responsible officer ZIP+4"),
      str("intr_naml", "Intermediary last name or organization name"),
      str("intr_namf", "Intermediary first name"),
      str("intr_namt", "Intermediary name title or prefix"),
      str("intr_nams", "Intermediary name suffix"),
      str("intr_city", "Intermediary city"),
      str("intr_st", "Intermediary state"),
      str("intr_zip4", "Intermediary ZIP+4"),
      str("intr_emp", "Intermediary employer"),
      str("intr_occ", "Intermediary occupation"),
      str("intr_self", "Is the intermediary self-employed? (y/n)"),
      str("intr_cmteid", "Committee id of the intermediary"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      str("cand_naml", "Candidate last name"),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"),
      str("xref_schnm", "Related record is on the referenced schedule"),
      str("xref_match", "Related record is included on the referenced schedule (x)"),
      str("int_rate", "Interest rate of a loan"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("rcpt_date", "date_thru"))

  /** ≙ FILER_FILINGS_CD — filer↔filing link with amendment sequence
    * (`models/common.py:~200`). */
  val filerFilingsCd: TableDef = TableDef(
    name = "filer_filings_cd",
    schema = StructType(Seq(
      lng("filer_id", "Filer unique identification number"),
      lng("filing_id", "Unique filing identification number"),
      lng("period_id", "Identifies the period the filing covers"),
      str("form_id", "Form identification code of the filed form"),
      lng("filing_sequence", "Amendment number; 0 original, 1+ amendments"),
      date("filing_date", "Date the filing was filed, M/D/YYYY in the raw file"),
      lng("stmnt_type", "Statement type of the filing"),
      lng("stmnt_status", "Status of the statement (accepted, rejected, ...)"),
      lng("session_id", "Legislative session the filing applies to"),
      str("user_id", "User id of the person who entered the filing"),
      lng("special_audit", "Denotes whether the filing underwent a special audit"),
      lng("fine_audit", "Denotes whether a fine audit was performed"),
      date("rpt_start", "Start date of the period the report covers, M/D/YYYY"),
      date("rpt_end", "End date of the period the report covers, M/D/YYYY"),
      date("rpt_date", "Date the report was filed, M/D/YYYY in the raw file"),
      lng("filing_type", "Type code of the filing"))),
    uniqueKey = Seq("filer_id", "filing_id", "form_id", "filing_sequence"),
    dateFields = Seq("filing_date", "rpt_start", "rpt_end", "rpt_date"))

  /** ≙ LOOKUP_CODES_CD — the dimension/decode table
    * (`models/inactive.py:~400`). FULL declared column set — the raw
    * table carries exactly these three columns. */
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
        doc("Summary amount from column C")),
      StructField("elec_dt", DateType, nullable = true,
        doc("Date of the election, M/D/YYYY in the raw file")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("elec_dt"))

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
      str("namt", "Name title or prefix"),
      str("nams", "Name suffix"),
      str("adr1", "Street address, line 1"),
      str("adr2", "Street address, line 2"),
      str("city", "City"),
      str("st", "State"),
      str("zip4", "ZIP+4"),
      str("phon", "Phone number"),
      str("fax", "Fax number"),
      str("email", "Email address"),
      StructField("effect_dt", TimestampType, nullable = true,
        doc("Effective datetime of the name record, " +
          "M/D/YYYY H:MM:SS AM in the raw file")))),
    uniqueKey = Seq("filer_id", "naml", "effect_dt"),
    datetimeFields = Seq("effect_dt"))

  /** ≙ EXPN_CD — itemized expenditures (`models/campaign.py`), the second
    * big fact table; same shape class as rcpt_cd. FULL declared column
    * set in raw-TSV order (public CAL-ACCESS file documentation). */
  val expnCd: TableDef = TableDef(
    name = "expn_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type, always EXPN"),
      str("form_type", "Schedule of the form on which the expense is reported"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("payee_naml", "Payee last name or organization name"),
      str("payee_namf", "Payee first name"),
      str("payee_namt", "Payee name title or prefix"),
      str("payee_nams", "Payee name suffix"),
      str("payee_city", "Payee city"),
      str("payee_st", "Payee state"),
      str("payee_zip4", "Payee ZIP+4"),
      str("entity_cd", "Entity code of the payee (documented set in meta.Annotations: BNM, CAO, COM, CTL, IND, MDI, OFF, OTH, PTY, RCP, SCC, SMO)"),
      date("expn_date", "Date of the expenditure, M/D/YYYY in the raw file"),
      money("amount", "Amount paid to the payee in the period of the statement"),
      money("cum_ytd", "Cumulative year-to-date amount paid to this payee"),
      money("cum_oth", "Cumulative other (F401 second total) amount"),
      str("expn_chkno", "Check number of the expenditure"),
      str("expn_code", "Expense code from the lookup-code domain"),
      str("expn_dscr", "Purpose of the expense beyond the standard code"),
      str("agent_naml", "Agent or independent contractor last name"),
      str("agent_namf", "Agent or independent contractor first name"),
      str("agent_namt", "Agent or independent contractor name title"),
      str("agent_nams", "Agent or independent contractor name suffix"),
      str("cmte_id", "Committee identification number of the payee committee"),
      str("tres_naml", "Treasurer or responsible officer last name"),
      str("tres_namf", "Treasurer or responsible officer first name"),
      str("tres_namt", "Treasurer or responsible officer name title"),
      str("tres_nams", "Treasurer or responsible officer name suffix"),
      str("tres_city", "Treasurer or responsible officer city"),
      str("tres_st", "Treasurer or responsible officer state"),
      str("tres_zip4", "Treasurer or responsible officer ZIP+4"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      str("cand_naml", "Candidate last name"),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("g_from_e_f", "Back-reference from Schedule G to Schedule E or F"),
      str("xref_schnm", "Related record is on the referenced schedule"),
      str("xref_match", "Related record is included on the referenced schedule (x)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("expn_date"))

  /** ≙ CVR_SO_CD — statement-of-organization cover page
    * (`models/campaign.py`): one row per filing describing the committee.
    * FULL declared column set (public CAL-ACCESS file documentation):
    * committee identity + street/mailing blocks, treasurer block,
    * financial-institution block, the committee-type check boxes, the
    * 82013 cross-reference, and the qualification/termination dates. */
  val cvrSoCd: TableDef = TableDef(
    name = "cvr_so_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      str("rec_type", "Record type of the cover page, always CVR"),
      str("form_type", "Statement form type (F400, F402, F410)"),
      lng("filer_id", "Filer unique identification number"),
      str("entity_cd", "Entity code of the filer (COM, CTL, RCP, SMO, ...)"),
      str("filer_naml", "Filer last name or committee name"),
      str("filer_namf", "Filer first name"),
      str("filer_namt", "Filer name title or prefix"),
      str("filer_nams", "Filer name suffix"),
      str("city", "Committee street address city"),
      str("st", "Committee street address state"),
      str("zip4", "Committee street address ZIP+4"),
      str("phone", "Committee phone number"),
      str("mail_city", "Committee mailing address city"),
      str("mail_st", "Committee mailing address state"),
      str("mail_zip4", "Committee mailing address ZIP+4"),
      str("cmte_email", "Committee email address"),
      str("cmte_fax", "Committee fax number"),
      date("rpt_date", "Date of the statement, M/D/YYYY in the raw file"),
      date("qualfy_dt", "Date the committee qualified, M/D/YYYY in the raw file"),
      date("smcont_qualdt", "Date small-contributor committee status was qualified"),
      date("acct_opendt", "Date the committee bank account was opened"),
      date("term_date", "Date the committee terminated"),
      str("report_num", "Report number; 000 original, 001-999 amendments"),
      str("actvty_lvl", "Activity level of the committee (CI city, CO county, ST state)"),
      str("county_act", "County of main activity for a local committee"),
      str("county_res", "County of residence or domicile"),
      str("qual_cb", "Qualified-committee check box (X or blank)"),
      str("sponsor_cb", "Sponsored-committee check box (X or blank)"),
      str("primfc_cb", "Primarily-formed committee check box (X or blank)"),
      str("genpurp_cb", "General-purpose committee check box (X or blank)"),
      str("gpc_descr", "Description of a general-purpose committee's activity"),
      str("control_cb", "Controlled-committee check box (X or blank)"),
      str("brdbase_cb", "Broad-based committee check box (X or blank)"),
      str("surplusdsp", "Disposition of surplus funds on termination"),
      str("com82013yn", "Is the committee a Government Code 82013 committee? (y/n)"),
      str("com82013id", "Filer id of the existing 82013 committee"),
      str("com82013nm", "Name of the existing 82013 committee"),
      str("bank_nam", "Name of the committee's financial institution"),
      str("bank_adr1", "Financial institution street address, line 1"),
      str("bank_adr2", "Financial institution street address, line 2"),
      str("bank_city", "Financial institution city"),
      str("bank_st", "Financial institution state"),
      str("bank_zip4", "Financial institution ZIP+4"),
      str("bank_phon", "Financial institution phone number"),
      str("tres_naml", "Treasurer last name"),
      str("tres_namf", "Treasurer first name"),
      str("tres_namt", "Treasurer name title or prefix"),
      str("tres_nams", "Treasurer name suffix"),
      str("tres_city", "Treasurer city"),
      str("tres_st", "Treasurer state"),
      str("tres_zip4", "Treasurer ZIP+4"),
      str("tres_phon", "Treasurer phone number"))),
    uniqueKey = Seq("filing_id", "amend_id", "rec_type", "form_type"),
    dateFields = Seq("rpt_date", "qualfy_dt", "smcont_qualdt",
      "acct_opendt", "term_date"))

  /** ≙ LOAN_CD — itemized loans received/made (`models/campaign.py`). */
  val loanCd: TableDef = TableDef(
    name = "loan_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always LOAN"),
      str("form_type", "Schedule of the form on which the loan is reported (B1/B2/H...)"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("loan_type", "Type of loan"),
      str("entity_cd", "Entity code of the lender (documented set in meta.Annotations: BNM, CAO, COM, CTL, IND, MDI, OFF, OTH, PTY, RCP, SCC, SMO)"),
      str("lndr_naml", "Lender last name or organization name"),
      str("lndr_namf", "Lender first name"),
      str("lndr_namt", "Lender name title or prefix"),
      str("lndr_nams", "Lender name suffix"),
      str("loan_adr1", "Lender street address line 1"),
      str("loan_adr2", "Lender street address line 2"),
      str("loan_city", "Lender city"),
      str("loan_st", "Lender state"),
      str("loan_zip4", "Lender ZIP+4"),
      str("loan_emp", "Lender employer"),
      str("loan_occ", "Lender occupation"),
      str("loan_self", "Is the lender self-employed? (y/n)"),
      date("loan_date1", "Date the loan was made or received, M/D/YYYY in the raw file"),
      date("loan_date2", "Date the loan is due, M/D/YYYY in the raw file"),
      money("loan_amt1", "Amount of the loan received/made this period"),
      money("loan_amt2", "Outstanding balance of the loan"),
      money("loan_amt3", "Cumulative amount to date"),
      money("loan_amt4", "Outstanding balance at the beginning of the period"),
      money("loan_amt5", "Amount paid this period"),
      money("loan_amt6", "Amount forgiven this period"),
      money("loan_amt7", "Amount of interest paid this period"),
      money("loan_amt8", "Original amount of the loan"),
      str("loan_rate", "Interest rate of the loan, free text"),
      str("intr_naml", "Intermediary last name or organization name"),
      str("intr_namf", "Intermediary first name"),
      str("intr_namt", "Intermediary name title or prefix"),
      str("intr_nams", "Intermediary name suffix"),
      str("intr_adr1", "Intermediary street address line 1"),
      str("intr_adr2", "Intermediary street address line 2"),
      str("intr_city", "Intermediary city"),
      str("intr_st", "Intermediary state"),
      str("intr_zip4", "Intermediary ZIP+4"),
      str("cmte_id", "Committee identification number of the lender committee"),
      str("tres_naml", "Treasurer last name"),
      str("tres_namf", "Treasurer first name"),
      str("tres_namt", "Treasurer name title or prefix"),
      str("tres_nams", "Treasurer name suffix"),
      str("tres_adr1", "Treasurer street address line 1"),
      str("tres_adr2", "Treasurer street address line 2"),
      str("tres_city", "Treasurer city"),
      str("tres_st", "Treasurer state"),
      str("tres_zip4", "Treasurer ZIP+4"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"),
      str("xref_schnm", "Related record is on the referenced schedule"),
      str("xref_match", "Related record is included on the referenced schedule (x)"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("loan_date1", "loan_date2"))

  /** ≙ DEBT_CD — accrued expenses / unpaid bills (`models/campaign.py`). */
  val debtCd: TableDef = TableDef(
    name = "debt_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always DEBT"),
      str("form_type", "Schedule of the form on which the debt is reported, always F"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the creditor (documented set in meta.Annotations: BNM, CAO, COM, CTL, IND, MDI, OFF, OTH, PTY, RCP, SCC, SMO)"),
      str("payee_naml", "Creditor last name or organization name"),
      str("payee_namf", "Creditor first name"),
      str("payee_namt", "Creditor name title or prefix"),
      str("payee_nams", "Creditor name suffix"),
      str("payee_city", "Creditor city"),
      str("payee_st", "Creditor state"),
      str("payee_zip4", "Creditor ZIP+4"),
      money("amt_incur", "Amount incurred this period"),
      money("amt_paid", "Amount paid this period"),
      money("beg_bal", "Outstanding balance at the beginning of the period"),
      money("end_bal", "Outstanding balance at the end of the period"),
      str("expn_code", "Expense code from the lookup-code domain"),
      str("expn_dscr", "Purpose of the debt beyond the standard code"),
      str("cmte_id", "Committee identification number of the creditor committee"),
      str("tres_naml", "Treasurer last name"),
      str("tres_namf", "Treasurer first name"),
      str("tres_namt", "Treasurer name title or prefix"),
      str("tres_nams", "Treasurer name suffix"),
      str("tres_city", "Treasurer city"),
      str("tres_st", "Treasurer state"),
      str("tres_zip4", "Treasurer ZIP+4"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"),
      str("xref_schnm", "Related record is on the referenced schedule"),
      str("xref_match", "Related record is included on the referenced schedule (x)"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"))

  /** ≙ S497_CD — late-contribution (24-hour) reports
    * (`models/campaign.py`). */
  val s497Cd: TableDef = TableDef(
    name = "s497_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always S497"),
      str("form_type", "Part of the 497 form the record belongs to (F497P1/F497P2)"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the contributor/recipient"),
      str("enty_naml", "Entity last name or organization name"),
      str("enty_namf", "Entity first name"),
      str("enty_namt", "Entity name title or prefix"),
      str("enty_nams", "Entity name suffix"),
      str("enty_city", "Entity city"),
      str("enty_st", "Entity state"),
      str("enty_zip4", "Entity ZIP+4"),
      str("ctrib_emp", "Contributor employer"),
      str("ctrib_occ", "Contributor occupation"),
      str("ctrib_self", "Is the contributor self-employed? (y/n)"),
      date("elec_date", "Date of the election, M/D/YYYY in the raw file"),
      date("ctrib_date", "Date the contribution was received, M/D/YYYY in the raw file"),
      date("date_thru", "End of date range the contribution was received, M/D/YYYY"),
      money16("amount", "Amount received or contributed"),
      str("cmte_id", "Committee identification number"),
      lng("cand_id", "Candidate identification number"),
      str("cand_naml", "Candidate last name"),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("bal_id", "Ballot measure identification number"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("elec_date", "ctrib_date", "date_thru"))

  /** ≙ LATT_CD — lobbyist contribution attachments
    * (`models/lobbying.py`). FULL declared column set (public CAL-ACCESS
    * file documentation). */
  val lattCd: TableDef = TableDef(
    name = "latt_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the transaction, always LATT")),
      StructField("form_type", StringType, nullable = true,
        doc("Schedule of the attachment (S630, S635-C, S640, ...)")),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the recipient"),
      StructField("recip_naml", StringType, nullable = true,
        doc("Recipient last name or organization name")),
      str("recip_namf", "Recipient first name"),
      str("recip_namt", "Recipient name title or prefix"),
      str("recip_nams", "Recipient name suffix"),
      str("recip_city", "Recipient city"),
      str("recip_st", "Recipient state"),
      str("recip_zip4", "Recipient ZIP+4"),
      StructField("pmt_date", DateType, nullable = true,
        doc("Date of the payment, M/D/YYYY in the raw file")),
      StructField("amount", DecimalType(14, 2), nullable = true,
        doc("Amount of the payment")),
      StructField("cum_amt", DecimalType(14, 2), nullable = true,
        doc("Cumulative amount paid to date")),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("pmt_date"))

  /** ≙ LEXP_CD — lobbying activity expenses (`models/lobbying.py:~400-900`).
    * FULL declared column set (public CAL-ACCESS file documentation):
    * payee name/address block, expense date/amount/description, the
    * beneficiary block, and the memo/back-reference tail shared by the
    * itemization tables. `bene_amt` stays text — it is free-form in the
    * raw data and the reference declares it as a character field. */
  val lexpCd: TableDef = TableDef(
    name = "lexp_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always LEXP"),
      str("form_type", "Schedule of the form on which the expense is reported"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the payee"),
      str("payee_naml", "Payee last name or organization name"),
      str("payee_namf", "Payee first name"),
      str("payee_namt", "Payee name title or prefix"),
      str("payee_nams", "Payee name suffix"),
      str("payee_city", "Payee city"),
      str("payee_st", "Payee state"),
      str("payee_zip4", "Payee ZIP+4"),
      date("expn_date", "Date of the expense, M/D/YYYY in the raw file"),
      money("amount", "Amount of the activity expense"),
      str("expn_dscr", "Description of the expense"),
      str("bene_name", "Name of the official benefiting from the expense"),
      str("bene_posit", "Official position of the beneficiary"),
      str("bene_amt", "Amount of the benefit; free-form text in the raw data"),
      str("credcardco", "Name of the credit card company, if paid by card"),
      str("recsubtype", "Record subtype (1 Form 615, 2 attachment)"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("expn_date"))

  /** ≙ LPAY_CD — payments made to/received by lobbying firms
    * (`models/lobbying.py:~400-900`). FULL declared column set (public
    * CAL-ACCESS file documentation): employer name/address/id block, the
    * fee/reimbursement/advance amounts with the period and cumulative
    * totals, and the lobbying-activity description. */
  val lpayCd: TableDef = TableDef(
    name = "lpay_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always LPAY"),
      str("form_type", "Schedule of the form on which the payment is reported"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the employer"),
      str("emplr_naml", "Employer last name or organization name"),
      str("emplr_namf", "Employer first name"),
      str("emplr_namt", "Employer name title or prefix"),
      str("emplr_nams", "Employer name suffix"),
      str("emplr_city", "Employer city"),
      str("emplr_st", "Employer state"),
      str("emplr_zip4", "Employer ZIP+4"),
      str("emplr_phon", "Employer phone number"),
      str("emplr_id", "Filer id of the employer, if a filer"),
      money("fees_amt", "Fees and retainers paid this period"),
      money("reimb_amt", "Reimbursements for expenses paid this period"),
      money("advan_amt", "Advances and other payments this period"),
      str("advan_dscr", "Description of the advance or other payment"),
      money("per_total", "Total payments for the period"),
      money("cum_total", "Cumulative total payments to date"),
      str("lby_actvty", "Description of the lobbying activity performed"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"))

  /** ≙ CVR_CAMPAIGN_DISCLOSURE_CD — campaign-disclosure cover page
    * (`models/campaign.py`). FULL declared column set in raw-TSV order
    * (public CAL-ACCESS file documentation): filer/candidate/treasurer
    * identity+address blocks, reporting-period and election dates, and
    * the F461/F465 business-interest fields. */
  val cvrCampaignDisclosureCd: TableDef = TableDef(
    name = "cvr_campaign_disclosure_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      str("rec_type", "Record type of the cover page, always CVR"),
      str("form_type", "Form filed (F450, F460, F461, ...)"),
      lng("filer_id", "Filer unique identification number"),
      str("entity_cd", "Entity code of the filer"),
      str("filer_naml", "Filer last name or committee name"),
      str("filer_namf", "Filer first name"),
      str("filer_namt", "Filer name title or prefix"),
      str("filer_nams", "Filer name suffix"),
      str("filer_adr1", "Filer street address line 1"),
      str("filer_adr2", "Filer street address line 2"),
      str("filer_city", "Filer city"),
      str("filer_st", "Filer state"),
      str("filer_zip4", "Filer ZIP+4"),
      str("filer_phon", "Filer phone number"),
      str("filer_fax", "Filer fax number"),
      str("file_email", "Filer email address"),
      date("rpt_date", "Date the report was prepared, M/D/YYYY in the raw file"),
      date("from_date", "Reporting period start date, M/D/YYYY in the raw file"),
      date("thru_date", "Reporting period end date, M/D/YYYY in the raw file"),
      date("elect_date", "Date of the election, M/D/YYYY in the raw file"),
      date("rptfromdt", "Attached-report period start date, M/D/YYYY"),
      date("rptthrudt", "Attached-report period end date, M/D/YYYY"),
      str("late_rptno", "Identifying number of a late report"),
      str("report_num", "Report number; 000 original, 001+ amendments"),
      str("reportname", "Name of the attached report (450, 460, 461, ...)"),
      str("stmt_type", "Type of statement (PE pre-election, QT quarterly, ...)"),
      str("amendexp_1", "Amendment explanation line 1"),
      str("amendexp_2", "Amendment explanation line 2"),
      str("amendexp_3", "Amendment explanation line 3"),
      str("cmtte_id", "Committee id of a recipient committee"),
      str("cmtte_type", "Committee type (C candidate controlled, ...)"),
      str("control_yn", "Is the committee candidate-controlled? (y/n)"),
      str("sponsor_yn", "Is the committee sponsored? (y/n)"),
      str("primfrm_yn", "Is this the primarily-formed committee? (y/n)"),
      str("brdbase_yn", "Is the committee broad-based? (y/n)"),
      lng("cand_id", "Candidate identification number"),
      str("cand_naml", "Candidate last name"),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("cand_adr1", "Candidate street address line 1"),
      str("cand_adr2", "Candidate street address line 2"),
      str("cand_city", "Candidate city"),
      str("cand_st", "Candidate state"),
      str("cand_zip4", "Candidate ZIP+4"),
      str("cand_phon", "Candidate phone number"),
      str("cand_fax", "Candidate fax number"),
      str("cand_email", "Candidate email address"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_id", "Ballot measure identification number"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("tres_naml", "Treasurer last name"),
      str("tres_namf", "Treasurer first name"),
      str("tres_namt", "Treasurer name title or prefix"),
      str("tres_nams", "Treasurer name suffix"),
      str("tres_adr1", "Treasurer street address line 1"),
      str("tres_adr2", "Treasurer street address line 2"),
      str("tres_city", "Treasurer city"),
      str("tres_st", "Treasurer state"),
      str("tres_zip4", "Treasurer ZIP+4"),
      str("tres_phon", "Treasurer phone number"),
      str("tres_fax", "Treasurer fax number"),
      str("tres_email", "Treasurer email address"),
      str("occupation", "Occupation of the filer (F461, F465)"),
      str("employer", "Employer of the filer (F461, F465)"),
      str("selfemp_cb", "Is the filer self-employed? checkbox"),
      str("bus_name", "Name of the filer's business (F461)"),
      str("bus_adr1", "Business street address line 1"),
      str("bus_adr2", "Business street address line 2"),
      str("bus_city", "Business city"),
      str("bus_st", "Business state"),
      str("bus_zip4", "Business ZIP+4"),
      str("bus_inter", "Business interest of the filer"),
      str("busact_cb", "Business activity checkbox"),
      str("busactvity", "Description of the business activity"),
      str("assoc_cb", "Association interests checkbox"),
      str("assoc_int", "Description of the association interests"),
      str("other_cb", "Other interests checkbox"),
      str("other_int", "Description of the other interests"),
      str("emplbus_cb", "Employer or business checkbox"),
      str("rpt_att_cb", "Checkbox: a report is attached"),
      str("mail_adr1", "Mailing street address line 1"),
      str("mail_adr2", "Mailing street address line 2"),
      str("mail_city", "Mailing address city"),
      str("mail_st", "Mailing address state"),
      str("mail_zip4", "Mailing address ZIP+4"))),
    uniqueKey = Seq("filing_id", "amend_id", "rec_type", "form_type"),
    dateFields = Seq("rpt_date", "from_date", "thru_date", "elect_date",
      "rptfromdt", "rptthrudt"))

  /** ≙ FILER_LINKS_CD — relationships between filer entities
    * (`models/common.py`): the graph edge table. */
  val filerLinksCd: TableDef = TableDef(
    name = "filer_links_cd",
    schema = StructType(Seq(
      StructField("filer_id_a", LongType, nullable = true,
        doc("Unique identification number of the first filer")),
      StructField("filer_id_b", LongType, nullable = true,
        doc("Unique identification number of the second filer")),
      StructField("active_flg", StringType, nullable = true,
        doc("Is the link active? (Y/N)")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session the link applies to")),
      StructField("link_type", LongType, nullable = true,
        doc("Denotes the type of the link")),
      StructField("link_desc", StringType, nullable = true,
        doc("Description of the link")),
      StructField("effect_dt", DateType, nullable = true,
        doc("Effective date of the link, M/D/YYYY in the raw file")),
      StructField("dominate_filer", StringType, nullable = true,
        doc("Is the first filer the dominant one in the link? (Y/N)")),
      StructField("termination_dt", DateType, nullable = true,
        doc("Termination date of the link, M/D/YYYY in the raw file")))),
    uniqueKey = Seq("filer_id_a", "filer_id_b", "session_id", "link_type",
      "effect_dt"),
    dateFields = Seq("effect_dt", "termination_dt"))

  /** ≙ CVR_LOBBY_DISCLOSURE_CD — lobbying-disclosure cover page
    * (`models/lobbying.py:~100-400`). FULL declared column set,
    * reconstructed from the public CAL-ACCESS CVR record layout shared by
    * the F615/F625/F635/F645 disclosure forms: filer identity, reporting
    * period, firm and mailing-address blocks, the signature and
    * printed-name blocks, the part-1/part-2 participation checkboxes, the
    * F635 major-donor name block, and the recipient committee. Street
    * address lines (ADR1/ADR2) are excluded throughout the catalog,
    * mirroring the reference's deliberate omission. `sig_date` stays a
    * datetime (P5 coercion surface). */
  val cvrLobbyDisclosureCd: TableDef = TableDef(
    name = "cvr_lobby_disclosure_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      str("rec_type", "Record type of the cover page, always CVR"),
      str("form_type", "Form filed (F615, F625, F635, F645, ...)"),
      str("sender_id", "Filer id of the submitter (lobbying firm or employer)"),
      lng("filer_id", "Filer unique identification number"),
      str("entity_cd", "Entity code of the filer (FRM, LBY, LEM, LCO, IND)"),
      str("filer_naml", "Filer last name or organization name"),
      str("filer_namf", "Filer first name"),
      str("filer_namt", "Filer name title or prefix"),
      str("filer_nams", "Filer name suffix"),
      str("report_num", "Report number; 000 is the original, amendments count up"),
      date("rpt_date", "Date the report was filed, M/D/YYYY in the raw file"),
      date("from_date", "Reporting period start date, M/D/YYYY in the raw file"),
      date("thru_date", "Reporting period end date, M/D/YYYY in the raw file"),
      date("cum_beg_dt", "Cumulative period beginning date"),
      str("firm_id", "Identification number of the lobbying firm"),
      str("firm_name", "Name of the lobbying firm or employer"),
      str("firm_city", "Firm business address city"),
      str("firm_st", "Firm business address state"),
      str("firm_zip4", "Firm business address ZIP+4"),
      str("firm_phon", "Firm business phone number"),
      str("mail_city", "Filer mailing address city"),
      str("mail_st", "Filer mailing address state"),
      str("mail_zip4", "Filer mailing address ZIP+4"),
      str("mail_phon", "Filer mailing address phone number"),
      StructField("sig_date", TimestampType, nullable = true,
        doc("Datetime the filing was signed, " +
          "M/D/YYYY H:MM:SS AM in the raw file")),
      str("sig_loc", "City and state where the filing was signed"),
      str("sig_naml", "Signer last name"),
      str("sig_namf", "Signer first name"),
      str("sig_namt", "Signer name title or prefix"),
      str("sig_nams", "Signer name suffix"),
      str("prn_naml", "Printed signer last name"),
      str("prn_namf", "Printed signer first name"),
      str("prn_namt", "Printed signer name title or prefix"),
      str("prn_nams", "Printed signer name suffix"),
      str("sig_title", "Title of the signer"),
      str("nopart1_cb", "Checkbox: no part 1 activity to report (X or blank)"),
      str("nopart2_cb", "Checkbox: no part 2 activity to report (X or blank)"),
      str("part1_1_cb", "Checkbox: part 1 section 1 completed (X or blank)"),
      str("part1_2_cb", "Checkbox: part 1 section 2 completed (X or blank)"),
      str("ctrib_n_cb", "Checkbox: no campaign contributions made (X or blank)"),
      str("ctrib_y_cb", "Checkbox: campaign contributions made (X or blank)"),
      str("lby_actvty", "Description of the lobbying activity"),
      str("lobby_n_cb", "Checkbox: no activity in the period (X or blank)"),
      str("lobby_y_cb", "Checkbox: activity in the period (X or blank)"),
      str("major_naml", "Major donor last name or organization name (F635)"),
      str("major_namf", "Major donor first name (F635)"),
      str("major_namt", "Major donor name title or prefix (F635)"),
      str("major_nams", "Major donor name suffix (F635)"),
      str("rcpcmte_nm", "Name of the recipient committee"),
      str("rcpcmte_id", "Identification number of the recipient committee"))),
    uniqueKey = Seq("filing_id", "amend_id", "rec_type", "form_type"),
    dateFields = Seq("rpt_date", "from_date", "thru_date", "cum_beg_dt"),
    datetimeFields = Seq("sig_date"))

  // ── Tier 3: filings backbone, schedule tables, registration,
  //    dimensions, and the tracking/lineage star (SURVEY §1.3) ──────────

  /** ≙ FILINGS_CD — the master filings directory (`models/common.py`).
    * FULL declared column set — the raw table carries exactly these two
    * columns. */
  val filingsCd: TableDef = TableDef(
    name = "filings_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("filing_type", LongType, nullable = true,
        doc("Numeric code of the filing type, decoded via lookup codes")))),
    uniqueKey = Seq("filing_id", "filing_type"))

  /** ≙ HDR_CD — electronic-filing header record (`models/common.py`).
    * FULL declared column set (public CAL-ACCESS file documentation). */
  val hdrCd: TableDef = TableDef(
    name = "hdr_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the header, always HDR")),
      StructField("cal_ver", StringType, nullable = true,
        doc("CAL format version of the electronic filing")),
      StructField("soft_name", StringType, nullable = true,
        doc("Name of the software that produced the filing")),
      StructField("soft_ver", StringType, nullable = true,
        doc("Version of the software that produced the filing")),
      StructField("state_cd", StringType, nullable = true,
        doc("State code of the filing, always CA")),
      str("ef_type", "Electronic filing type, always F"),
      str("hdr_comment", "Filer or vendor comment on the header record"))),
    uniqueKey = Seq("filing_id", "amend_id"))

  /** ≙ TEXT_MEMO_CD — free-text memo lines referenced by itemization
    * records across forms (`models/common.py`). */
  val textMemoCd: TableDef = TableDef(
    name = "text_memo_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the memo, always TEXT")),
      StructField("form_type", StringType, nullable = true,
        doc("Form or schedule the memo annotates")),
      StructField("ref_no", StringType, nullable = true,
        doc("Reference number linking the memo to its itemization line")),
      StructField("text4000", StringType, nullable = true,
        doc("Memo text, up to 4000 characters")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"))

  /** ≙ CVR2_SO_CD — statement-of-organization additional names/officers
    * page (`models/campaign.py`). FULL declared column set (public
    * CAL-ACCESS file documentation): the named entity's name/address/
    * contact block, the affiliation fields, and the office/measure
    * identification block shared with the itemizations. */
  val cvr2SoCd: TableDef = TableDef(
    name = "cvr2_so_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the page, always CVR2")),
      StructField("form_type", StringType, nullable = true,
        doc("Statement form type (400, 402, 410, ...)")),
      StructField("tran_id", StringType, nullable = true,
        doc("Permanent value unique within the filing")),
      StructField("entity_cd", StringType, nullable = true,
        doc("Entity code of the named person/organization")),
      str("enty_naml", "Entity last name or organization name"),
      str("enty_namf", "Entity first name"),
      str("enty_namt", "Entity name title or prefix"),
      str("enty_nams", "Entity name suffix"),
      str("item_cd", "Section of the statement the entity is itemized under"),
      str("mail_city", "Entity mailing address city"),
      str("mail_st", "Entity mailing address state"),
      str("mail_zip4", "Entity mailing address ZIP+4"),
      str("day_phone", "Entity daytime phone number"),
      str("fax_phone", "Entity fax number"),
      str("email_adr", "Entity email address"),
      str("cmte_id", "Committee identification number of the entity"),
      str("ind_group", "Industry group or affiliation of the entity"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("non_pty_cb", "Non-partisan office check box"),
      str("party_name", "Political party name, if partisan"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      str("year_elect", "Year of the election"),
      str("pof_title", "Position or title of the principal officer"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"))

  /** ≙ S401_CD — Form 401 (slate-mailer) itemizations
    * (`models/campaign.py`). FULL declared column set (public CAL-ACCESS
    * file documentation): agent + payee name/address blocks, amounts,
    * and the candidate/measure identification block shared with the
    * other campaign itemizations. */
  val s401Cd: TableDef = TableDef(
    name = "s401_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always S401"),
      str("form_type", "Schedule of Form 401 the payment is reported on"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("agent_naml", "Agent or independent contractor last name"),
      str("agent_namf", "Agent or independent contractor first name"),
      str("agent_namt", "Agent or independent contractor name title or prefix"),
      str("agent_nams", "Agent or independent contractor name suffix"),
      str("payee_naml", "Payee last name or organization name"),
      str("payee_namf", "Payee first name"),
      str("payee_namt", "Payee name title or prefix"),
      str("payee_nams", "Payee name suffix"),
      str("payee_city", "Payee city"),
      str("payee_st", "Payee state"),
      str("payee_zip4", "Payee ZIP+4"),
      money("amount", "Amount paid or received this period"),
      money("aggregate", "Cumulative amount for the calendar year"),
      str("expn_dscr", "Description of the payment"),
      str("cand_naml", "Candidate last name"),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"))

  /** ≙ S496_CD — Form 496 late independent expenditures
    * (`models/campaign.py`). */
  val s496Cd: TableDef = TableDef(
    name = "s496_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the transaction, always S496")),
      StructField("form_type", StringType, nullable = true,
        doc("Form type, always F496")),
      StructField("tran_id", StringType, nullable = true,
        doc("Permanent value unique within the filing")),
      StructField("amount", DecimalType(14, 2), nullable = true,
        doc("Amount of the independent expenditure")),
      StructField("exp_date", DateType, nullable = true,
        doc("Date of the expenditure, M/D/YYYY in the raw file")),
      StructField("expn_dscr", StringType, nullable = true,
        doc("Description of the expenditure")),
      StructField("date_thru", DateType, nullable = true,
        doc("End of date range the expenditure was made, M/D/YYYY")),
      StructField("memo_code", StringType, nullable = true,
        doc("Memo amount flag")),
      StructField("memo_refno", StringType, nullable = true,
        doc("Reference number to a text memo (TEXT_MEMO_CD)")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("exp_date", "date_thru"))

  /** ≙ S498_CD — Form 498 late payments received by slate mailers
    * (`models/campaign.py`). FULL declared column set (public CAL-ACCESS
    * file documentation): payor name/address block, receipt
    * date/amount, the candidate/measure identification block, and the
    * per-candidate attribution amount. */
  val s498Cd: TableDef = TableDef(
    name = "s498_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always S498"),
      str("form_type", "Schedule of Form 498 the payment is reported on"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the payor (documented set in meta.Annotations: BNM, CAO, COM, CTL, IND, MDI, OFF, OTH, PTY, RCP, SCC, SMO)"),
      str("cmte_id", "Committee identification number of the payor"),
      str("payor_naml", "Payor last name or organization name"),
      str("payor_namf", "Payor first name"),
      str("payor_namt", "Payor name title or prefix"),
      str("payor_nams", "Payor name suffix"),
      str("payor_city", "Payor city"),
      str("payor_st", "Payor state"),
      str("payor_zip4", "Payor ZIP+4"),
      date("date_rcvd", "Date received, M/D/YYYY in the raw file"),
      money("amt_rcvd", "Amount received from the payor"),
      str("cand_naml", "Candidate last name"),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      str("bal_name", "Ballot measure name"),
      str("bal_num", "Ballot measure number or letter"),
      str("bal_juris", "Ballot measure jurisdiction"),
      str("sup_opp_cd", "Support or opposition code (S/O)"),
      money("amt_attrib", "Amount attributed to the candidate or measure"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("date_rcvd"))

  /** ≙ SPLT_CD — per-candidate/measure allocation splits of transactions
    * (`models/campaign.py`). */
  val spltCd: TableDef = TableDef(
    name = "splt_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("pform_type", StringType, nullable = true,
        doc("Parent schedule the split transaction belongs to")),
      StructField("ptran_id", StringType, nullable = true,
        doc("Parent transaction id the split applies to")),
      StructField("elec_amount", DecimalType(14, 2), nullable = true,
        doc("Amount allocated to the election")),
      StructField("elec_code", StringType, nullable = true,
        doc("Election code of the allocation")),
      StructField("elec_date", DateType, nullable = true,
        doc("Date of the election, M/D/YYYY in the raw file")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "pform_type"),
    dateFields = Seq("elec_date"))

  /** ≙ CVR_REGISTRATION_CD — lobbyist/firm/employer registration cover
    * page (`models/lobbying.py:~100-400`). Widened to the documented
    * form-field blocks of the F601–F607 registration family: filer
    * identity, legislative session, the agency-or-business and
    * authorizing-entity name blocks (F602/F603), industry/business
    * classification, firm and mailing-address blocks, the
    * new/renewal certification checkboxes, lobbying-interest
    * descriptions, qualification/effective/completion dates, and the
    * signature and printed-name blocks. A handful of auxiliary raw
    * columns whose exact names are less certain from public memory
    * (e.g. the business fax/email pair and the duplicate QUALFY_DT
    * rendering of the qualification date) are deliberately omitted
    * rather than guessed; street address lines (ADR1/ADR2) are excluded
    * throughout the catalog, mirroring the reference. */
  val cvrRegistrationCd: TableDef = TableDef(
    name = "cvr_registration_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      str("rec_type", "Record type of the cover page, always CVR"),
      str("form_type", "Registration form (F601, F602, F603, F604, ...)"),
      str("sender_id", "Filer id of the submitter"),
      lng("filer_id", "Filer unique identification number"),
      str("entity_cd", "Entity code of the registrant (FRM, LBY, LEM, LCO)"),
      str("filer_naml", "Filer last name or organization name"),
      str("filer_namf", "Filer first name"),
      str("filer_namt", "Filer name title or prefix"),
      str("filer_nams", "Filer name suffix"),
      str("report_num", "Report number; 000 is the original"),
      date("rpt_date", "Date the registration was filed, M/D/YYYY"),
      lng("ls_beg_yr", "Legislative session beginning year"),
      lng("ls_end_yr", "Legislative session ending year"),
      str("a_b_name", "Agency or business name the lobbyist works for"),
      str("a_b_city", "Agency or business address city"),
      str("a_b_st", "Agency or business address state"),
      str("a_b_zip4", "Agency or business address ZIP+4"),
      str("auth_name", "Name of the entity authorizing the registration"),
      str("auth_city", "Authorizing entity address city"),
      str("auth_st", "Authorizing entity address state"),
      str("auth_zip4", "Authorizing entity address ZIP+4"),
      str("bus_cb", "Checkbox: registrant is a business entity (X or blank)"),
      str("bus_class", "Classification code of the business (CIV, EDU, ...)"),
      str("bus_descr", "Description of the business when class is OTH"),
      str("bus_city", "Business address city"),
      str("bus_st", "Business address state"),
      str("bus_zip4", "Business address ZIP+4"),
      str("bus_phon", "Business phone number"),
      str("ind_cb", "Checkbox: registrant is an individual (X or blank)"),
      str("ind_class", "Classification code of the individual's industry"),
      str("ind_descr", "Description of the industry when class is OTH"),
      str("trade_cb", "Checkbox: trade association (X or blank)"),
      str("oth_cb", "Checkbox: other registrant type (X or blank)"),
      str("firm_name", "Name of the lobbying firm"),
      str("firm_city", "Firm business address city"),
      str("firm_st", "Firm business address state"),
      str("firm_zip4", "Firm business address ZIP+4"),
      str("firm_phon", "Firm business phone number"),
      str("mail_city", "Registrant mailing address city"),
      str("mail_st", "Registrant mailing address state"),
      str("mail_zip4", "Registrant mailing address ZIP+4"),
      str("mail_phon", "Registrant mailing address phone number"),
      str("l_firm_cb", "Checkbox: registrant is a lobbying firm (X or blank)"),
      str("lby_604_cb", "Checkbox: lobbyist filing a Form 604 (X or blank)"),
      str("lby_reg_cb", "Checkbox: lobbyist registration (X or blank)"),
      str("newcert_cb", "Checkbox: new certification (X or blank)"),
      str("rencert_cb", "Checkbox: renewal certification (X or blank)"),
      str("influen_yn", "Will the registrant attempt to influence state " +
        "legislative or administrative action? (Y/N)"),
      str("st_leg_yn", "Will the registrant lobby the state legislature? (Y/N)"),
      str("st_agency", "State agencies the registrant will lobby"),
      str("stmt_firm", "Statement of the responsible officer of the firm"),
      str("descrip_1", "Description of the lobbying interests, line 1"),
      str("descrip_2", "Description of the lobbying interests, line 2"),
      str("lobby_int", "Description of the registrant's lobbying interests"),
      date("qual_date", "Date qualified, M/D/YYYY in the raw file"),
      date("eff_date", "Effective date of the registration, M/D/YYYY"),
      date("complet_dt", "Date the ethics course was completed (F604/F606)"),
      date("sig_date", "Date the registration was signed, M/D/YYYY"),
      str("sig_loc", "City and state where the registration was signed"),
      str("sig_naml", "Signer last name"),
      str("sig_namf", "Signer first name"),
      str("sig_namt", "Signer name title or prefix"),
      str("sig_nams", "Signer name suffix"),
      str("sig_title", "Title of the signer"),
      str("prn_naml", "Printed signer last name"),
      str("prn_namf", "Printed signer first name"),
      str("prn_namt", "Printed signer name title or prefix"),
      str("prn_nams", "Printed signer name suffix"))),
    uniqueKey = Seq("filing_id", "amend_id", "rec_type", "form_type"),
    dateFields = Seq("rpt_date", "qual_date", "eff_date", "complet_dt",
      "sig_date"))

  /** ≙ LCCM_CD — lobbying campaign contributions made/arranged
    * (`models/lobbying.py:~400-900`). FULL declared column set (public
    * CAL-ACCESS file documentation): contributor and recipient
    * name/address blocks, contribution date/amount, and the
    * account-name/memo/back-reference tail. */
  val lccmCd: TableDef = TableDef(
    name = "lccm_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      lng("line_item", "Line item number of this record"),
      str("rec_type", "Record type of the transaction, always LCCM"),
      str("form_type", "Schedule of the lobbying form the contribution is on"),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the contributor"),
      str("ctrib_naml", "Contributor last name or organization name"),
      str("ctrib_namf", "Contributor first name"),
      str("ctrib_namt", "Contributor name title or prefix"),
      str("ctrib_nams", "Contributor name suffix"),
      str("ctrib_city", "Contributor city"),
      str("ctrib_st", "Contributor state"),
      str("ctrib_zip4", "Contributor ZIP+4"),
      date("ctrib_date", "Date of the contribution, M/D/YYYY in the raw file"),
      money("amount", "Amount of the contribution"),
      str("recip_naml", "Recipient committee or candidate last name"),
      str("recip_namf", "Recipient first name"),
      str("recip_namt", "Recipient name title or prefix"),
      str("recip_nams", "Recipient name suffix"),
      str("recip_city", "Recipient city"),
      str("recip_st", "Recipient state"),
      str("recip_zip4", "Recipient ZIP+4"),
      str("recip_id", "Committee identification number of the recipient"),
      str("acct_name", "Name of the bank account the contribution was made from"),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"),
    dateFields = Seq("ctrib_date"))

  /** ≙ LEMP_CD — lobbyist employers / subcontracted clients
    * (`models/lobbying.py`). FULL declared column set (public CAL-ACCESS
    * file documentation). */
  val lempCd: TableDef = TableDef(
    name = "lemp_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the record, always LEMP")),
      StructField("form_type", StringType, nullable = true,
        doc("Part of Form 601 the employer is listed under")),
      str("agencylist", "Agencies the employer lobbies, free text"),
      StructField("cli_naml", StringType, nullable = true,
        doc("Client last name or organization name")),
      str("cli_namf", "Client first name"),
      str("cli_namt", "Client name title or prefix"),
      str("cli_nams", "Client name suffix"),
      str("cli_city", "Client city"),
      str("cli_st", "Client state"),
      str("cli_zip4", "Client ZIP+4"),
      str("cli_phon", "Client phone number"),
      lng("client_id", "Identification number of the client, if a filer"),
      str("descrip", "Description of the client's business interests"),
      StructField("eff_date", DateType, nullable = true,
        doc("Effective date of the agreement, M/D/YYYY in the raw file")),
      StructField("con_period", StringType, nullable = true,
        doc("Contract period of the agreement, free text")),
      str("sub_name", "Name of the subcontracting firm, if subcontracted"),
      str("sub_city", "Subcontracting firm city"),
      str("sub_st", "Subcontracting firm state"),
      str("sub_zip4", "Subcontracting firm ZIP+4"),
      str("sub_phon", "Subcontracting firm phone number"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"),
    dateFields = Seq("eff_date"))

  /** ≙ LOTH_CD — payments made to lobbying coalitions / other payments
    * (`models/lobbying.py`). FULL declared column set (public CAL-ACCESS
    * file documentation). */
  val lothCd: TableDef = TableDef(
    name = "loth_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the transaction, always LOTH")),
      StructField("form_type", StringType, nullable = true,
        doc("Form type, always F625P3B")),
      str("tran_id", "Permanent transaction id, unique within the filing"),
      str("entity_cd", "Entity code of the party paid"),
      StructField("firm_name", StringType, nullable = true,
        doc("Name of the firm paid or paying")),
      str("firm_city", "Firm city"),
      str("firm_st", "Firm state"),
      str("firm_zip4", "Firm ZIP+4"),
      str("firm_phon", "Firm phone number"),
      str("subj_naml", "Last name of the lobbyist the payment concerns"),
      str("subj_namf", "First name of the lobbyist the payment concerns"),
      str("subj_namt", "Name title of the lobbyist the payment concerns"),
      str("subj_nams", "Name suffix of the lobbyist the payment concerns"),
      StructField("amt_this_per", DecimalType(14, 2), nullable = true,
        doc("Amount paid this reporting period")),
      money("cum_amt", "Cumulative amount paid to date"),
      StructField("pmt_date", DateType, nullable = true,
        doc("Date of the payment, M/D/YYYY in the raw file")),
      str("memo_code", "Memo amount flag"),
      str("memo_refno", "Reference number to a text memo (TEXT_MEMO_CD)"),
      str("bakref_tid", "Back-reference to a transaction id in a parent record"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"),
    dateFields = Seq("pmt_date"))

  /** ≙ FILER_TYPES_CD — filer-type dimension (`models/inactive.py`). */
  val filerTypesCd: TableDef = TableDef(
    name = "filer_types_cd",
    schema = StructType(Seq(
      StructField("filer_type", LongType, nullable = true,
        doc("Numeric filer-type code")),
      StructField("description", StringType, nullable = true,
        doc("Description of the filer type")),
      StructField("grp_type", LongType, nullable = true,
        doc("Group-type code the filer type belongs to")),
      StructField("calc_use", StringType, nullable = true,
        doc("Calculation-use flag")),
      StructField("grace_period", StringType, nullable = true,
        doc("Filing grace period, free text")))),
    uniqueKey = Seq("filer_type"))

  /** ≙ LEGISLATIVE_SESSIONS_CD — session dimension
    * (`models/inactive.py`). */
  val legislativeSessionsCd: TableDef = TableDef(
    name = "legislative_sessions_cd",
    schema = StructType(Seq(
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("begin_date", DateType, nullable = true,
        doc("Session start date, M/D/YYYY in the raw file")),
      StructField("end_date", DateType, nullable = true,
        doc("Session end date, M/D/YYYY in the raw file")))),
    uniqueKey = Seq("session_id"),
    dateFields = Seq("begin_date", "end_date"))

  /** ≙ RawDataVersion (`models/tracking.py`) — one row per monthly
    * export: the pipeline's run-level lineage record. In this engine it
    * is the metrics row `graft.Pipeline` emits per run. */
  val rawDataVersion: TableDef = TableDef(
    name = "raw_data_version",
    schema = StructType(Seq(
      StructField("release_datetime", TimestampType, nullable = true,
        doc("Datetime the CAL-ACCESS snapshot was released; unique")),
      StructField("expected_size", LongType, nullable = true,
        doc("Expected byte size of the downloaded archive")),
      StructField("download_start", TimestampType, nullable = true,
        doc("Datetime the download phase started")),
      StructField("download_finish", TimestampType, nullable = true,
        doc("Datetime the download phase finished")),
      StructField("clean_start", TimestampType, nullable = true,
        doc("Datetime the clean phase started")),
      StructField("clean_finish", TimestampType, nullable = true,
        doc("Datetime the clean phase finished")),
      StructField("load_start", TimestampType, nullable = true,
        doc("Datetime the load phase started")),
      StructField("load_finish", TimestampType, nullable = true,
        doc("Datetime the load phase finished")))),
    uniqueKey = Seq("release_datetime"),
    datetimeFields = Seq("release_datetime", "download_start",
      "download_finish", "clean_start", "clean_finish", "load_start",
      "load_finish"))

  /** ≙ RawDataFile (`models/tracking.py`) — per-table per-version
    * download/clean/load record counts: the file-level lineage star. */
  val rawDataFile: TableDef = TableDef(
    name = "raw_data_file",
    schema = StructType(Seq(
      StructField("version_release_datetime", TimestampType, nullable = true,
        doc("Release datetime of the version this file belongs to")),
      StructField("file_name", StringType, nullable = true,
        doc("Name of the raw TSV file, e.g. RCPT_CD")),
      StructField("download_records_count", LongType, nullable = true,
        doc("Row count of the raw downloaded TSV")),
      StructField("clean_records_count", LongType, nullable = true,
        doc("Row count after the clean phase")),
      StructField("load_records_count", LongType, nullable = true,
        doc("Row count loaded into the queryable store")),
      StructField("error_count", LongType, nullable = true,
        doc("Rows diverted to the error side-channel during clean")))),
    uniqueKey = Seq("version_release_datetime", "file_name"),
    datetimeFields = Seq("version_release_datetime"))

  // ── Tier 4: lobbyist directory itemizations, candidate filings,
  //    cross-reference and dimension tables (SURVEY §1.3) ──────────────

  /** ≙ F501_502_CD — candidate intention / bank account statements
    * (`models/campaign.py`). Widened round 10 to the documented blocks:
    * committee/report identity, the candidate name quad + address, the
    * office/jurisdiction block, and the expenditure-limit flag. Round
    * 11 adds the F502 financial-institution block from the public
    * model — the FIN_* name quad + address the bank-account statement
    * identifies (institution name parts, city/state/ZIP, phone). Any
    * remaining auxiliary account-date columns whose raw names are less
    * certain stay omitted rather than guessed. */
  val f501502Cd: TableDef = TableDef(
    name = "f501_502_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type, always CVR")),
      StructField("form_type", StringType, nullable = true,
        doc("Form filed: F501 (intention) or F502 (bank account)")),
      StructField("filer_id", StringType, nullable = true,
        doc("Filer unique identification number, free text in this form")),
      str("committee_id", "Committee identification number"),
      str("entity_cd", "Entity code of the filer"),
      str("report_num", "Report number; 000 is the original"),
      StructField("cand_naml", StringType, nullable = true,
        doc("Candidate last name")),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("cand_city", "Candidate address city"),
      str("cand_st", "Candidate address state"),
      str("cand_zip4", "Candidate address ZIP+4"),
      str("cand_phon", "Candidate phone number"),
      str("cand_email", "Candidate email address"),
      str("fin_limit_yn", "Accepts the voluntary expenditure " +
        "ceiling? (Y/N)"),
      StructField("office_cd", StringType, nullable = true,
        doc("Office sought code")),
      str("offic_dscr", "Office description when OFFICE_CD is OTH"),
      str("agency_nam", "Name of the agency the office belongs to"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Jurisdiction description when JURIS_CD is OTH"),
      StructField("district_cd", LongType, nullable = true,
        doc("District number of the office sought")),
      StructField("elec_year", LongType, nullable = true,
        doc("Election year")),
      StructField("rpt_date", DateType, nullable = true,
        doc("Date of the report, M/D/YYYY in the raw file")),
      StructField("execute_dt", DateType, nullable = true,
        doc("Date the statement was executed (signed), M/D/YYYY " +
          "in the raw file")),
      StructField("fin_naml", StringType, nullable = true,
        doc("Financial institution name (last name when an " +
          "individual holds the account)")),
      str("fin_namf", "Financial institution name, first-name part"),
      str("fin_namt", "Financial institution name title or prefix"),
      str("fin_nams", "Financial institution name suffix"),
      str("fin_city", "Financial institution address city"),
      str("fin_st", "Financial institution address state"),
      str("fin_zip4", "Financial institution address ZIP+4"),
      str("fin_phon", "Financial institution phone number"),
      str("cand_fax", "Candidate fax number"),
      str("moniker_pos", "Position of the moniker relative to the " +
        "candidate name"),
      str("moniker", "Moniker (nickname) the candidate runs under"),
      str("elec_type", "Election type (primary, general, special, ...)"),
      lng("yr_of_elec", "Year of the election"),
      str("party_cd", "Political party code of the candidate"),
      str("can_sig", "Candidate signature on the statement"),
      str("account_no", "Campaign bank account number (F502)"),
      date("acct_op_dt", "Date the campaign bank account was opened, " +
        "M/D/YYYY in the raw file"),
      str("accept_limit_yn", "Accepts the voluntary contribution " +
        "limit? (Y/N)"),
      date("did_exceed_dt", "Date contributions first exceeded the " +
        "threshold, M/D/YYYY"),
      date("cntrb_prsnl_fnds_dt", "Date personal funds were first " +
        "contributed, M/D/YYYY"))),
    uniqueKey = Seq("filing_id", "amend_id", "rec_type", "form_type"),
    dateFields = Seq("rpt_date", "execute_dt", "acct_op_dt",
      "did_exceed_dt", "cntrb_prsnl_fnds_dt"))

  /** ≙ CVR2_CAMPAIGN_DISCLOSURE_CD — campaign-disclosure additional
    * names page (`models/campaign.py:~400-900`): the committees,
    * officers, treasurers, candidates and ballot measures a cover page
    * continues onto. Widened to the documented blocks (entity name +
    * address, committee id/control, F460 part, office/jurisdiction,
    * ballot-measure triple, mailing address); any remaining auxiliary
    * raw columns whose names are less certain from public memory are
    * deliberately omitted rather than guessed. */
  val cvr2CampaignDisclosureCd: TableDef = TableDef(
    name = "cvr2_campaign_disclosure_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the page, always CVR2")),
      StructField("form_type", StringType, nullable = true,
        doc("Form the page extends (F450, F460, F461, ...)")),
      StructField("tran_id", StringType, nullable = true,
        doc("Permanent value unique within the filing")),
      StructField("entity_cd", StringType, nullable = true,
        doc("Entity code of the named committee/treasurer/officer")),
      str("enty_naml", "Entity last name or organization name"),
      str("enty_namf", "Entity first name"),
      str("enty_namt", "Entity name title or prefix"),
      str("enty_nams", "Entity name suffix"),
      str("enty_city", "Entity address city"),
      str("enty_st", "Entity address state"),
      str("enty_zip4", "Entity address ZIP+4"),
      str("enty_phon", "Entity phone number"),
      str("cmte_id", "Committee identification number, when the entity " +
        "is one"),
      str("control_yn", "Is the committee controlled by the candidate? " +
        "(Y/N)"),
      str("f460_part", "Part of the Form 460 the name belongs to"),
      str("office_cd", "Office sought or held by the named candidate"),
      str("offic_dscr", "Office description when office_cd is OTH"),
      str("juris_cd", "Jurisdiction of the office"),
      str("juris_dscr", "Jurisdiction description when juris_cd is OTH"),
      str("dist_no", "District number of the office"),
      str("off_s_h_cd", "Office sought/held code"),
      str("sup_opp_cd", "Support or opposition code"),
      str("title", "Title of the named officer/treasurer"),
      str("bal_name", "Name of the ballot measure, when the entity is one"),
      str("bal_num", "Number or letter of the ballot measure"),
      str("bal_juris", "Jurisdiction of the ballot measure"),
      str("mail_city", "Entity mailing address city"),
      str("mail_st", "Entity mailing address state"),
      str("mail_zip4", "Entity mailing address ZIP+4"),
      str("tres_naml", "Treasurer or responsible officer last name"),
      str("tres_namf", "Treasurer or responsible officer first name"),
      str("tres_namt", "Treasurer name title or prefix"),
      str("tres_nams", "Treasurer name suffix"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type",
      "form_type"))

  /** ≙ CVR2_LOBBY_DISCLOSURE_CD — lobbying-disclosure additional names
    * page (`models/lobbying.py:~100-400`): the partners, owners and
    * employers a disclosure cover page continues onto. Widened to the
    * documented CVR2 record blocks (tran id, entity code/id, full name
    * parts, title). */
  val cvr2LobbyDisclosureCd: TableDef = TableDef(
    name = "cvr2_lobby_disclosure_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the page, always CVR2")),
      StructField("form_type", StringType, nullable = true,
        doc("Form the page extends (F615, F625, F635, F645, ...)")),
      str("tran_id", "Permanent value unique within the filing"),
      str("entity_cd", "Entity code of the named person/organization"),
      str("entity_id", "Filer id of the named entity, when registered"),
      str("enty_naml", "Entity last name or organization name"),
      str("enty_namf", "Entity first name"),
      str("enty_namt", "Entity name title or prefix"),
      str("enty_nams", "Entity name suffix"),
      str("enty_title", "Title of the named person"),
      str("main_naml", "Last/organization name of the prime firm " +
        "when the named entity is a subcontracted firm"),
      str("main_namf", "First name of the prime firm's signatory"),
      str("main_namt", "Prime-firm name title or prefix"),
      str("main_nams", "Prime-firm name suffix"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"))

  /** ≙ LOBBYIST_FIRM1_CD (directory family) — lobbying-firm directory
    * year snapshot (`models/lobbying.py`). */
  /** Per-quarter payment columns shared by the LOBBYIST_*1/2/3 ranking
    * and *_HISTORY rollup tables (the raw files carry eight QTR_n
    * amounts per row — one per quarter of the two-year session). */
  private def qtrFields(what: String): Seq[StructField] =
    (1 to 8).map(q => money16(s"qtr_$q",
      s"$what in quarter $q of the legislative session"))

  val lobbyistFirm1Cd: TableDef = TableDef(
    name = "lobbyist_firm1_cd",
    schema = StructType(Seq(
      StructField("firm_id", LongType, nullable = true,
        doc("Lobbying firm identification number")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("firm_name", StringType, nullable = true,
        doc("Name of the lobbying firm")),
      StructField("current_qtr_amt", DecimalType(16, 2), nullable = true,
        doc("Payments received in the current quarter")),
      StructField("session_total_amt", DecimalType(16, 2), nullable = true,
        doc("Payments received across the legislative session")),
      StructField("contributor_id", LongType, nullable = true,
        doc("Contributor identification number of the firm")),
      StructField("session_yr_1", LongType, nullable = true,
        doc("First year of the legislative session")),
      StructField("session_yr_2", LongType, nullable = true,
        doc("Second year of the legislative session")),
      money16("yr_1_ytd_amt",
        "Year-to-date payments received in the session's first year"),
      money16("yr_2_ytd_amt",
        "Year-to-date payments received in the session's second year"))
      ++ qtrFields("Payments received")),
    uniqueKey = Seq("firm_id", "session_id"))

  /** ≙ LOBBYIST_EMPLOYER1_CD — lobbyist-employer directory year
    * snapshot (`models/lobbying.py`). */
  val lobbyistEmployer1Cd: TableDef = TableDef(
    name = "lobbyist_employer1_cd",
    schema = StructType(Seq(
      StructField("employer_id", LongType, nullable = true,
        doc("Lobbyist employer identification number")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("employer_name", StringType, nullable = true,
        doc("Name of the employer")),
      StructField("current_qtr_amt", DecimalType(16, 2), nullable = true,
        doc("Payments made in the current quarter")),
      StructField("session_total_amt", DecimalType(16, 2), nullable = true,
        doc("Payments made across the legislative session")),
      StructField("contributor_id", LongType, nullable = true,
        doc("Contributor identification number of the employer")),
      StructField("interest_cd", LongType, nullable = true,
        doc("Industry interest code, decoded via lookup codes")),
      StructField("interest_name", StringType, nullable = true,
        doc("Name of the industry interest category")),
      StructField("session_yr_1", LongType, nullable = true,
        doc("First year of the legislative session")),
      StructField("session_yr_2", LongType, nullable = true,
        doc("Second year of the legislative session")),
      money16("yr_1_ytd_amt",
        "Year-to-date payments made in the session's first year"),
      money16("yr_2_ytd_amt",
        "Year-to-date payments made in the session's second year"))
      ++ qtrFields("Payments made")),
    uniqueKey = Seq("employer_id", "session_id"))

  /** ≙ LOBBYIST_CONTRIBUTIONS1_CD — lobbyist campaign-contribution
    * directory rows (`models/lobbying.py`). */
  val lobbyistContributions1Cd: TableDef = TableDef(
    name = "lobbyist_contributions1_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Contributing lobbyist filer identification number")),
      StructField("filing_period_start_dt", DateType, nullable = true,
        doc("Start date of the filing period, M/D/YYYY in the raw file")),
      StructField("filing_period_end_dt", DateType, nullable = true,
        doc("End date of the filing period, M/D/YYYY in the raw file")),
      StructField("contribution_dt", StringType, nullable = true,
        doc("Date of the contribution, free text in the raw file")),
      StructField("recipient_name", StringType, nullable = true,
        doc("Name of the recipient committee")),
      StructField("recipient_id", LongType, nullable = true,
        doc("Recipient committee identification number")),
      StructField("amount", DecimalType(14, 2), nullable = true,
        doc("Amount of the contribution")))),
    uniqueKey = Seq("filer_id", "filing_period_start_dt",
      "recipient_name"),
    dateFields = Seq("filing_period_start_dt", "filing_period_end_dt"))

  /** ≙ FILER_XREF_CD — filer id cross-reference (legacy ↔ current).
    * FULL declared column set (public CAL-ACCESS file documentation)
    * (`models/common.py`). */
  val filerXrefCd: TableDef = TableDef(
    name = "filer_xref_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Current filer identification number")),
      StructField("xref_id", StringType, nullable = true,
        doc("Crossed-referenced legacy filer identification value")),
      StructField("effect_dt", DateType, nullable = true,
        doc("Effective date of the cross reference, M/D/YYYY")),
      StructField("migration_source", StringType, nullable = true,
        doc("System the cross reference was migrated from")))),
    uniqueKey = Seq("filer_id", "xref_id"),
    dateFields = Seq("effect_dt"))

  /** ≙ FILER_ADDRESS_CD — filer ↔ address link (`models/common.py`). */
  val filerAddressCd: TableDef = TableDef(
    name = "filer_address_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer unique identification number")),
      StructField("adrid", LongType, nullable = true,
        doc("Address record identification number")),
      StructField("effect_dt", DateType, nullable = true,
        doc("Date the address took effect, M/D/YYYY in the raw file")),
      StructField("add_type", LongType, nullable = true,
        doc("Address type code, decoded via lookup codes")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session the address applies to")))),
    uniqueKey = Seq("filer_id", "adrid"),
    dateFields = Seq("effect_dt"))

  /** ≙ NAMES_CD — the normalized name directory (`models/common.py`).
    * FULL declared column set (public CAL-ACCESS file documentation). */
  val namesCd: TableDef = TableDef(
    name = "names_cd",
    schema = StructType(Seq(
      StructField("namid", LongType, nullable = true,
        doc("Name record identification number")),
      StructField("naml", StringType, nullable = true,
        doc("Last name or organization name")),
      StructField("namf", StringType, nullable = true,
        doc("First name")),
      StructField("namt", StringType, nullable = true,
        doc("Name title or prefix")),
      StructField("nams", StringType, nullable = true,
        doc("Name suffix")),
      StructField("moniker", StringType, nullable = true,
        doc("Informal moniker")),
      str("moniker_pos", "Position of the moniker within the name"),
      str("namm", "Middle name"),
      str("fullname", "Assembled full name"),
      str("naml_search", "Normalized last name used for searching"))),
    uniqueKey = Seq("namid"))

  /** ≙ BALLOT_MEASURES_CD — ballot-measure dimension
    * (`models/common.py`). */
  val ballotMeasuresCd: TableDef = TableDef(
    name = "ballot_measures_cd",
    schema = StructType(Seq(
      StructField("measure_no", StringType, nullable = true,
        doc("Ballot measure number as it appears on the ballot")),
      StructField("measure_name", StringType, nullable = true,
        doc("Name of the ballot measure")),
      StructField("measure_short_name", StringType, nullable = true,
        doc("Abbreviated measure name")),
      StructField("election_date", DateType, nullable = true,
        doc("Date of the election, M/D/YYYY in the raw file")),
      StructField("jurisdiction", StringType, nullable = true,
        doc("Jurisdiction the measure appears in")),
      lng("filer_id", "Filer id of the committee formed for the measure"))),
    uniqueKey = Seq("measure_no", "election_date"),
    dateFields = Seq("election_date"))

  /** ≙ RECEIVED_FILINGS_CD — paper-filing receipt log
    * (`models/inactive.py`). */
  val receivedFilingsCd: TableDef = TableDef(
    name = "received_filings_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("filer_id", LongType, nullable = true,
        doc("Filer unique identification number")),
      StructField("form_id", StringType, nullable = true,
        doc("Form type of the received filing")),
      StructField("received_date", DateType, nullable = true,
        doc("Date the filing was received, M/D/YYYY in the raw file")),
      StructField("filing_directory", StringType, nullable = true,
        doc("Archive directory the scanned filing is stored in")),
      str("filing_file_name", "File name of the scanned filing"),
      str("receive_comment", "Comment recorded at receipt"),
      str("filing_type", "Type code of the received filing"))),
    uniqueKey = Seq("filing_id", "form_id"),
    dateFields = Seq("received_date"))

  /** ≙ GROUP_TYPES_CD — filer-group dimension (`models/inactive.py`). */
  val groupTypesCd: TableDef = TableDef(
    name = "group_types_cd",
    schema = StructType(Seq(
      StructField("grp_id", LongType, nullable = true,
        doc("Group identification number")),
      StructField("grp_name", StringType, nullable = true,
        doc("Name of the group")),
      StructField("grp_desc", StringType, nullable = true,
        doc("Description of the group")),
      StructField("grp_type", LongType, nullable = true,
        doc("Group type code")))),
    uniqueKey = Seq("grp_id"))

  /** ≙ CVR_E530_CD — Form E530 issue-advocacy report cover
    * (`models/common.py`). */
  /** Widened round 10 to the documented blocks: filer identity + name
    * quad + address, report identity, occupation/employer, the candidate
    * name quad and office/jurisdiction block the issue-advocacy payment
    * concerns, and the payment itself. Round 11 adds the
    * communication-type flag block from the public model — one 1/0 flag
    * per medium the E-530 paper form enumerates (literature, print ads,
    * radio, TV, information technology, billboards, other) plus the
    * free-text description accompanying the `other` flag. */
  val cvrE530Cd: TableDef = TableDef(
    name = "cvr_e530_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the cover page, always CVR")),
      StructField("form_type", StringType, nullable = true,
        doc("Form type, always E530")),
      StructField("entity_cd", StringType, nullable = true,
        doc("Entity code of the filer")),
      StructField("filer_id", LongType, nullable = true,
        doc("Filer unique identification number")),
      str("filer_naml", "Filer last name or organization name"),
      str("filer_namf", "Filer first name"),
      str("filer_namt", "Filer name title or prefix"),
      str("filer_nams", "Filer name suffix"),
      str("report_num", "Report number; 000 is the original"),
      StructField("rpt_date", DateType, nullable = true,
        doc("Date of the report, M/D/YYYY in the raw file")),
      str("filer_city", "Filer address city"),
      str("filer_st", "Filer address state"),
      str("filer_zip4", "Filer address ZIP+4"),
      str("occupation", "Filer occupation"),
      str("employer", "Filer employer"),
      StructField("cand_naml", StringType, nullable = true,
        doc("Candidate last name the communication concerns")),
      str("cand_namf", "Candidate first name"),
      str("cand_namt", "Candidate name title or prefix"),
      str("cand_nams", "Candidate name suffix"),
      str("office_cd", "Office sought or held code"),
      str("offic_dscr", "Office description when OFFICE_CD is OTH"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Jurisdiction description when JURIS_CD is OTH"),
      str("dist_no", "District number for the office, when applicable"),
      StructField("pmnt_amount", DecimalType(14, 2), nullable = true,
        doc("Amount of the payment reported")),
      StructField("pmnt_dt", DateType, nullable = true,
        doc("Date of the payment, M/D/YYYY in the raw file")),
      StructField("type_literature", LongType, nullable = true,
        doc("Communication type is literature (1/0)")),
      StructField("type_printads", LongType, nullable = true,
        doc("Communication type is print advertisements (1/0)")),
      StructField("type_radio", LongType, nullable = true,
        doc("Communication type is radio (1/0)")),
      StructField("type_tv", LongType, nullable = true,
        doc("Communication type is television (1/0)")),
      StructField("type_it", LongType, nullable = true,
        doc("Communication type is information technology " +
          "(web sites, email) (1/0)")),
      StructField("type_billboards", LongType, nullable = true,
        doc("Communication type is billboards (1/0)")),
      StructField("type_other", LongType, nullable = true,
        doc("Communication type is other (1/0)")),
      str("other_desc", "Description of the communication when " +
        "TYPE_OTHER is set"))),
    uniqueKey = Seq("filing_id", "amend_id"),
    dateFields = Seq("pmnt_dt", "rpt_date"))

  /** ≙ F495P2_CD — Form 495 supplemental pre-election statement part 2
    * (`models/campaign.py`). */
  val f495P2Cd: TableDef = TableDef(
    name = "f495p2_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type, always F495")),
      StructField("form_type", StringType, nullable = true,
        doc("Form the supplement attaches to (F450 or F460)")),
      StructField("elect_date", DateType, nullable = true,
        doc("Date of the election, M/D/YYYY in the raw file")),
      StructField("electjuris", StringType, nullable = true,
        doc("Jurisdiction of the election")),
      StructField("contribamt", DecimalType(14, 2), nullable = true,
        doc("Contributions received in the supplemental period")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"),
    dateFields = Seq("elect_date"))

  /** ≙ CVR2_REGISTRATION_CD — lobbying-registration additional names
    * page (`models/lobbying.py:~100-400`): the partners, owners and
    * officers a registration cover page continues onto. Widened to the
    * documented CVR2 record blocks (tran id, entity code/id, full name
    * parts). */
  val cvr2RegistrationCd: TableDef = TableDef(
    name = "cvr2_registration_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the page, always CVR2")),
      StructField("form_type", StringType, nullable = true,
        doc("Registration form the page extends (F601, F602, ...)")),
      StructField("tran_id", StringType, nullable = true,
        doc("Permanent value unique within the filing")),
      str("entity_cd", "Entity code of the named person/organization"),
      str("entity_id", "Filer id of the named entity, when registered"),
      str("enty_naml", "Entity last name or organization name"),
      str("enty_namf", "Entity first name"),
      str("enty_namt", "Entity name title or prefix"),
      str("enty_nams", "Entity name suffix"),
      str("a_b_name", "Agency or business the registrant lobbies, " +
        "named on the continuation page"),
      str("a_b_adr1", "Agency/business address line 1"),
      str("a_b_adr2", "Agency/business address line 2"),
      str("a_b_city", "Agency/business city"),
      str("a_b_st", "Agency/business state"),
      str("a_b_zip4", "Agency/business ZIP+4"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"))

  /** ≙ CVR3_VERIFICATION_INFO_CD — verification/signature page
    * (`models/campaign.py`). */
  val cvr3VerificationInfoCd: TableDef = TableDef(
    name = "cvr3_verification_info_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the page, always CVR3")),
      StructField("form_type", StringType, nullable = true,
        doc("Form being verified")),
      StructField("tran_id", StringType, nullable = true,
        doc("Permanent value unique within the filing")),
      str("entity_cd", "Entity code of the signer"),
      StructField("sig_date", DateType, nullable = true,
        doc("Date the verification was signed, M/D/YYYY in the raw file")),
      str("sig_loc", "City and state where the verification was signed"),
      StructField("sig_naml", StringType, nullable = true,
        doc("Signer last name")),
      str("sig_namf", "Signer first name"),
      str("sig_namt", "Signer name title or prefix"),
      str("sig_nams", "Signer name suffix"))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item", "rec_type"),
    dateFields = Seq("sig_date"))

  /** ≙ LOBBY_AMENDMENTS_CD — lobbying registration amendment log
    * (`models/lobbying.py`). */
  val lobbyAmendmentsCd: TableDef = TableDef(
    name = "lobby_amendments_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type, always F605")),
      StructField("form_type", StringType, nullable = true,
        doc("Form type, always F605")),
      StructField("exec_date", DateType, nullable = true,
        doc("Date the amendment was executed, M/D/YYYY in the raw file")),
      StructField("from_date", DateType, nullable = true,
        doc("Amended effective period start, M/D/YYYY in the raw file")),
      StructField("thru_date", DateType, nullable = true,
        doc("Amended effective period end, M/D/YYYY in the raw file")),
      // the three add/delete blocks of Form 605: lobbyists (L),
      // lobbying employers (LE), and subcontracted firms (LF) — each a
      // checkbox, an effective date, and the party's name fields
      str("add_l_cb", "Checkbox: the amendment adds a lobbyist"),
      date("add_l_eff", "Effective date of the added lobbyist, M/D/YYYY"),
      str("a_l_naml", "Added lobbyist last name"),
      str("a_l_namf", "Added lobbyist first name"),
      str("a_l_namt", "Added lobbyist name title or prefix"),
      str("a_l_nams", "Added lobbyist name suffix"),
      str("del_l_cb", "Checkbox: the amendment deletes a lobbyist"),
      date("del_l_eff", "Effective date of the deleted lobbyist, M/D/YYYY"),
      str("d_l_naml", "Deleted lobbyist last name"),
      str("d_l_namf", "Deleted lobbyist first name"),
      str("d_l_namt", "Deleted lobbyist name title or prefix"),
      str("d_l_nams", "Deleted lobbyist name suffix"),
      str("add_le_cb", "Checkbox: the amendment adds a lobbying employer"),
      date("add_le_eff",
        "Effective date of the added lobbying employer, M/D/YYYY"),
      str("a_le_naml", "Added lobbying employer last name or organization"),
      str("a_le_namf", "Added lobbying employer first name"),
      str("a_le_namt", "Added lobbying employer name title or prefix"),
      str("a_le_nams", "Added lobbying employer name suffix"),
      str("del_le_cb", "Checkbox: the amendment deletes a lobbying employer"),
      date("del_le_eff",
        "Effective date of the deleted lobbying employer, M/D/YYYY"),
      str("d_le_naml", "Deleted lobbying employer last name or organization"),
      str("d_le_namf", "Deleted lobbying employer first name"),
      str("d_le_namt", "Deleted lobbying employer name title or prefix"),
      str("d_le_nams", "Deleted lobbying employer name suffix"),
      str("add_lf_cb", "Checkbox: the amendment adds a subcontracted firm"),
      date("add_lf_eff",
        "Effective date of the added subcontracted firm, M/D/YYYY"),
      str("a_lf_name", "Added subcontracted firm name"),
      str("del_lf_cb", "Checkbox: the amendment deletes a subcontracted firm"),
      date("del_lf_eff",
        "Effective date of the deleted subcontracted firm, M/D/YYYY"),
      str("d_lf_name", "Deleted subcontracted firm name"))),
    uniqueKey = Seq("filing_id", "amend_id"),
    dateFields = Seq("exec_date", "from_date", "thru_date", "add_l_eff",
      "del_l_eff", "add_le_eff", "del_le_eff", "add_lf_eff", "del_lf_eff"))

  /** ≙ LOBBYING_CHG_LOG_CD — lobbying registry change log
    * (`models/lobbying.py`). */
  val lobbyingChgLogCd: TableDef = TableDef(
    name = "lobbying_chg_log_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer unique identification number")),
      StructField("change_no", LongType, nullable = true,
        doc("Sequential change number for the filer")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session the change applies to")),
      StructField("log_dt", DateType, nullable = true,
        doc("Date the change was logged, M/D/YYYY in the raw file")),
      StructField("filer_type", LongType, nullable = true,
        doc("Filer type code at the time of the change")),
      StructField("correction_flg", StringType, nullable = true,
        doc("Y when the entry corrects an earlier one")),
      str("action", "Description of the change action taken"),
      str("attribute_changed", "Name of the attribute the change modifies"),
      date("ethics_dt",
        "Date of the filer's ethics-course completion, M/D/YYYY"),
      str("interests", "Industry interests of the filer, free text"),
      str("filer_full_name", "Full name of the filer after the change"),
      str("filer_city", "Filer city after the change"),
      str("filer_st", "Filer state after the change"),
      str("filer_zip4", "Filer ZIP+4 after the change"),
      str("filer_phone", "Filer phone number after the change"),
      lng("entity_type", "Type code of the related entity"),
      str("entity_name", "Name of the related entity"),
      str("entity_city", "Related entity city"),
      str("entity_st", "Related entity state"),
      str("entity_zip4", "Related entity ZIP+4"),
      str("entity_phone", "Related entity phone number"),
      lng("entity_id", "Identification number of the related entity"),
      str("responsible_entity",
        "Entity responsible for the change, free text"),
      date("effect_dt", "Effective date of the change, M/D/YYYY"))),
    uniqueKey = Seq("filer_id", "change_no"),
    dateFields = Seq("log_dt", "ethics_dt", "effect_dt"))

  /** ≙ FILING_PERIOD_CD — filing-period dimension, FULL declared
    * column set
    * (`models/inactive.py`). */
  val filingPeriodCd: TableDef = TableDef(
    name = "filing_period_cd",
    schema = StructType(Seq(
      StructField("period_id", LongType, nullable = true,
        doc("Filing period identification number")),
      StructField("start_date", DateType, nullable = true,
        doc("Period start date, M/D/YYYY in the raw file")),
      StructField("end_date", DateType, nullable = true,
        doc("Period end date, M/D/YYYY in the raw file")),
      StructField("period_type", LongType, nullable = true,
        doc("Period type code, decoded via lookup codes")),
      StructField("per_grp_type", LongType, nullable = true,
        doc("Period group type code")),
      StructField("period_desc", StringType, nullable = true,
        doc("Description of the period")),
      StructField("deadline", DateType, nullable = true,
        doc("Filing deadline of the period, M/D/YYYY in the raw file")))),
    uniqueKey = Seq("period_id"),
    dateFields = Seq("start_date", "end_date", "deadline"))

  /** ≙ IMAGE_LINKS_CD — scanned-image link table
    * (`models/inactive.py`). */
  val imageLinksCd: TableDef = TableDef(
    name = "image_links_cd",
    schema = StructType(Seq(
      StructField("img_link_id", LongType, nullable = true,
        doc("Image link identification number")),
      StructField("img_link_type", LongType, nullable = true,
        doc("Image link type code")),
      StructField("img_id", LongType, nullable = true,
        doc("Image identification number")),
      StructField("img_type", LongType, nullable = true,
        doc("Image type code")),
      StructField("img_dt", DateType, nullable = true,
        doc("Date of the image, M/D/YYYY in the raw file")))),
    uniqueKey = Seq("img_link_id", "img_id"),
    dateFields = Seq("img_dt"))

  // ——— tier 5: the remaining lobbyist directory + inactive dimensions,
  // completing the ~80-table catalog (`models/lobbying.py`,
  // `models/inactive.py`) ———

  /** The LOBBYIST_*1/2/3_CD directory tables are successive refresh
    * snapshots with IDENTICAL layouts in the reference (each `…2Cd`/
    * `…3Cd` model re-declares the `…1Cd` columns verbatim); the registry
    * derives the later snapshots from the first's schema so the layouts
    * can never drift apart. */
  private def snapshot(base: TableDef, n: Int): TableDef =
    base.copy(name = base.name.replace("1_cd", s"${n}_cd"))

  val lobbyistFirm2Cd: TableDef = snapshot(lobbyistFirm1Cd, 2)
  val lobbyistFirm3Cd: TableDef = snapshot(lobbyistFirm1Cd, 3)
  val lobbyistEmployer2Cd: TableDef = snapshot(lobbyistEmployer1Cd, 2)
  val lobbyistEmployer3Cd: TableDef = snapshot(lobbyistEmployer1Cd, 3)
  val lobbyistContributions2Cd: TableDef =
    snapshot(lobbyistContributions1Cd, 2)
  val lobbyistContributions3Cd: TableDef =
    snapshot(lobbyistContributions1Cd, 3)

  /** ≙ LOBBYIST_EMP_LOBBYIST1_CD — employer ↔ lobbyist link directory
    * (`models/lobbying.py`). */
  val lobbyistEmpLobbyist1Cd: TableDef = TableDef(
    name = "lobbyist_emp_lobbyist1_cd",
    schema = StructType(Seq(
      StructField("employer_id", LongType, nullable = true,
        doc("Lobbyist employer identification number")),
      StructField("lobbyist_id", LongType, nullable = true,
        doc("Lobbyist identification number")),
      StructField("lobbyist_last_name", StringType, nullable = true,
        doc("Last name of the lobbyist")),
      StructField("lobbyist_first_name", StringType, nullable = true,
        doc("First name of the lobbyist")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")))),
    uniqueKey = Seq("employer_id", "lobbyist_id", "session_id"))
  val lobbyistEmpLobbyist2Cd: TableDef = snapshot(lobbyistEmpLobbyist1Cd, 2)

  /** ≙ LOBBYIST_FIRM_EMPLOYER1_CD — firm ↔ employer engagement rows
    * with per-period and cumulative fees (`models/lobbying.py`). */
  val lobbyistFirmEmployer1Cd: TableDef = TableDef(
    name = "lobbyist_firm_employer1_cd",
    schema = StructType(Seq(
      StructField("firm_id", LongType, nullable = true,
        doc("Lobbying firm identification number")),
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("filing_sequence", LongType, nullable = true,
        doc("Amendment sequence; 0 is the original filing")),
      StructField("firm_name", StringType, nullable = true,
        doc("Name of the lobbying firm")),
      StructField("employer_name", StringType, nullable = true,
        doc("Name of the employer engaging the firm")),
      StructField("rpt_start", DateType, nullable = true,
        doc("Start date of the reporting period, M/D/YYYY in the raw file")),
      StructField("rpt_end", DateType, nullable = true,
        doc("End date of the reporting period, M/D/YYYY in the raw file")),
      StructField("per_total", DecimalType(14, 2), nullable = true,
        doc("Fees received from the employer this period")),
      StructField("cum_total", DecimalType(14, 2), nullable = true,
        doc("Cumulative fees received from the employer")))),
    uniqueKey = Seq("firm_id", "filing_id", "filing_sequence",
      "employer_name"),
    dateFields = Seq("rpt_start", "rpt_end"))
  val lobbyistFirmEmployer2Cd: TableDef =
    snapshot(lobbyistFirmEmployer1Cd, 2)

  /** ≙ LOBBYIST_FIRM_LOBBYIST1_CD — firm ↔ lobbyist link directory
    * (`models/lobbying.py`). */
  val lobbyistFirmLobbyist1Cd: TableDef = TableDef(
    name = "lobbyist_firm_lobbyist1_cd",
    schema = StructType(Seq(
      StructField("firm_id", LongType, nullable = true,
        doc("Lobbying firm identification number")),
      StructField("lobbyist_id", LongType, nullable = true,
        doc("Lobbyist identification number")),
      StructField("lobbyist_last_name", StringType, nullable = true,
        doc("Last name of the lobbyist")),
      StructField("lobbyist_first_name", StringType, nullable = true,
        doc("First name of the lobbyist")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")))),
    uniqueKey = Seq("firm_id", "lobbyist_id", "session_id"))
  val lobbyistFirmLobbyist2Cd: TableDef =
    snapshot(lobbyistFirmLobbyist1Cd, 2)

  /** ≙ LOBBYIST_EMPLOYER_FIRMS1_CD — employer ↔ engaged-firm directory
    * (`models/lobbying.py`). */
  val lobbyistEmployerFirms1Cd: TableDef = TableDef(
    name = "lobbyist_employer_firms1_cd",
    schema = StructType(Seq(
      StructField("employer_id", LongType, nullable = true,
        doc("Lobbyist employer identification number")),
      StructField("firm_id", LongType, nullable = true,
        doc("Engaged lobbying firm identification number")),
      StructField("firm_name", StringType, nullable = true,
        doc("Name of the engaged lobbying firm")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("termination_dt", StringType, nullable = true,
        doc("Date the engagement terminated, free text in the raw file")))),
    uniqueKey = Seq("employer_id", "firm_id", "session_id"))
  val lobbyistEmployerFirms2Cd: TableDef =
    snapshot(lobbyistEmployerFirms1Cd, 2)

  /** ≙ LOBBYIST_EMPLOYER_HISTORY_CD — employer payment history rollup
    * (`models/lobbying.py`). */
  val lobbyistEmployerHistoryCd: TableDef = TableDef(
    name = "lobbyist_employer_history_cd",
    schema = StructType(Seq(
      StructField("contributor_id", LongType, nullable = true,
        doc("Contributor identification number of the employer")),
      StructField("employer_id", LongType, nullable = true,
        doc("Lobbyist employer identification number")),
      StructField("employer_name", StringType, nullable = true,
        doc("Name of the employer")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("current_qtr_amt", DecimalType(16, 2), nullable = true,
        doc("Payments made in the current quarter")),
      StructField("session_total_amt", DecimalType(16, 2), nullable = true,
        doc("Payments made across the legislative session")),
      StructField("interest_cd", LongType, nullable = true,
        doc("Industry interest code, decoded via lookup codes")),
      StructField("interest_name", StringType, nullable = true,
        doc("Name of the industry interest category")),
      StructField("session_yr_1", LongType, nullable = true,
        doc("First year of the legislative session")),
      StructField("session_yr_2", LongType, nullable = true,
        doc("Second year of the legislative session")),
      money16("yr_1_ytd_amt",
        "Year-to-date payments made in the session's first year"),
      money16("yr_2_ytd_amt",
        "Year-to-date payments made in the session's second year"))
      ++ qtrFields("Payments made")),
    uniqueKey = Seq("employer_id", "session_id"))

  /** ≙ LOBBYIST_FIRM_HISTORY_CD — firm payment history rollup
    * (`models/lobbying.py`). */
  val lobbyistFirmHistoryCd: TableDef = TableDef(
    name = "lobbyist_firm_history_cd",
    schema = StructType(Seq(
      StructField("contributor_id", LongType, nullable = true,
        doc("Contributor identification number of the firm")),
      StructField("firm_id", LongType, nullable = true,
        doc("Lobbying firm identification number")),
      StructField("firm_name", StringType, nullable = true,
        doc("Name of the lobbying firm")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("current_qtr_amt", DecimalType(16, 2), nullable = true,
        doc("Payments received in the current quarter")),
      StructField("session_total_amt", DecimalType(16, 2), nullable = true,
        doc("Payments received across the legislative session")),
      StructField("session_yr_1", LongType, nullable = true,
        doc("First year of the legislative session")),
      StructField("session_yr_2", LongType, nullable = true,
        doc("Second year of the legislative session")),
      money16("yr_1_ytd_amt",
        "Year-to-date payments received in the session's first year"),
      money16("yr_2_ytd_amt",
        "Year-to-date payments received in the session's second year"))
      ++ qtrFields("Payments received")),
    uniqueKey = Seq("firm_id", "session_id"))

  /** ≙ F690P2_CD — amendment to lobbying disclosure report
    * (`models/lobbying.py`). */
  val f690P2Cd: TableDef = TableDef(
    name = "f690p2_cd",
    schema = StructType(Seq(
      StructField("filing_id", LongType, nullable = true,
        doc("Unique filing identification number")),
      StructField("amend_id", LongType, nullable = true,
        doc("Amendment identification number; 0 is the original")),
      StructField("line_item", LongType, nullable = true,
        doc("Line item number of this record")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the transaction, always F690")),
      StructField("form_type", StringType, nullable = true,
        doc("Name of the source filing form or schedule")),
      StructField("exec_date", DateType, nullable = true,
        doc("Date the amendment was executed, M/D/YYYY in the raw file")),
      StructField("from_date", DateType, nullable = true,
        doc("Start of the period the amendment covers")),
      StructField("thru_date", DateType, nullable = true,
        doc("End of the period the amendment covers")),
      StructField("chg_parts", StringType, nullable = true,
        doc("Amended into parts, e.g. 1, 2")),
      StructField("amend_txt1", StringType, nullable = true,
        doc("Description of the amendment")))),
    uniqueKey = Seq("filing_id", "amend_id", "line_item"),
    dateFields = Seq("exec_date", "from_date", "thru_date"))

  /** ≙ ACRONYMS_CD — acronym glossary dimension (`models/inactive.py`). */
  val acronymsCd: TableDef = TableDef(
    name = "acronyms_cd",
    schema = StructType(Seq(
      StructField("acronym", StringType, nullable = true,
        doc("Acronym text, the lookup key")),
      StructField("stands_for", StringType, nullable = true,
        doc("What the acronym stands for")),
      StructField("effect_dt", DateType, nullable = true,
        doc("Date the acronym took effect, M/D/YYYY in the raw file")),
      StructField("a_desc", StringType, nullable = true,
        doc("Description of the acronym")))),
    uniqueKey = Seq("acronym"),
    dateFields = Seq("effect_dt"))

  /** ≙ ADDRESS_CD — shared address directory (`models/inactive.py`). */
  val addressCd: TableDef = TableDef(
    name = "address_cd",
    schema = StructType(Seq(
      StructField("adrid", LongType, nullable = true,
        doc("Address identification number, the lookup key")),
      StructField("city", StringType, nullable = true,
        doc("Address city")),
      StructField("st", StringType, nullable = true,
        doc("Address state")),
      StructField("zip4", StringType, nullable = true,
        doc("Address ZIP+4")),
      StructField("phon", StringType, nullable = true,
        doc("Address phone number")),
      StructField("fax", StringType, nullable = true,
        doc("Address fax number")),
      StructField("email", StringType, nullable = true,
        doc("Address email")))),
    uniqueKey = Seq("adrid"))

  /** ≙ FILERS_CD — the bare filer id spine every filer_* dimension
    * hangs off (`models/inactive.py`). */
  val filersCd: TableDef = TableDef(
    name = "filers_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer identification number, the registry spine")))),
    uniqueKey = Seq("filer_id"))

  /** ≙ FILER_ACRONYMS_CD — filer ↔ acronym link (`models/inactive.py`). */
  val filerAcronymsCd: TableDef = TableDef(
    name = "filer_acronyms_cd",
    schema = StructType(Seq(
      StructField("acronym", StringType, nullable = true,
        doc("Acronym used by the filer")),
      StructField("filer_id", LongType, nullable = true,
        doc("Filer identification number")))),
    uniqueKey = Seq("acronym", "filer_id"))

  /** ≙ FILER_ETHICS_CLASS_CD — filer ethics-training record
    * (`models/inactive.py`). */
  val filerEthicsClassCd: TableDef = TableDef(
    name = "filer_ethics_class_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer identification number")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("ethics_date", DateType, nullable = true,
        doc("Date the ethics training was completed"))),
    ),
    uniqueKey = Seq("filer_id", "session_id"),
    dateFields = Seq("ethics_date"))

  /** ≙ FILER_INTERESTS_CD — filer industry-interest record
    * (`models/inactive.py`). */
  val filerInterestsCd: TableDef = TableDef(
    name = "filer_interests_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer identification number")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("interest_cd", LongType, nullable = true,
        doc("Industry interest code, decoded via lookup codes")),
      StructField("effect_date", DateType, nullable = true,
        doc("Date the interest declaration took effect")))),
    uniqueKey = Seq("filer_id", "session_id", "interest_cd"),
    dateFields = Seq("effect_date"))

  /** ≙ FILER_STATUS_TYPES_CD — filer status code dimension
    * (`models/inactive.py`). */
  val filerStatusTypesCd: TableDef = TableDef(
    name = "filer_status_types_cd",
    schema = StructType(Seq(
      StructField("status_type", StringType, nullable = true,
        doc("Status code, the lookup key (A, ACTIVE, INACTIVE, ...)")),
      StructField("status_desc", StringType, nullable = true,
        doc("Documented meaning of the status code")))),
    uniqueKey = Seq("status_type"))

  /** ≙ FILER_TO_FILER_TYPE_CD — filer ↔ filer-type assignment with
    * effective-date ranges (`models/inactive.py`). Widened round 10 to
    * the FULL documented column set: the category/sub-category triple
    * (with their _TYPE partners), election type, race, and the
    * party/county/district residency codes. */
  val filerToFilerTypeCd: TableDef = TableDef(
    name = "filer_to_filer_type_cd",
    schema = StructType(Seq(
      StructField("filer_id", LongType, nullable = true,
        doc("Filer identification number")),
      StructField("filer_type", LongType, nullable = true,
        doc("Filer type code, decoded via filer_types_cd")),
      StructField("active", StringType, nullable = true,
        doc("Whether the assignment is active (Y/N)")),
      StructField("race", LongType, nullable = true,
        doc("Race (contest) identification number, when the filer " +
          "type is tied to one")),
      StructField("session_id", LongType, nullable = true,
        doc("Legislative session identification number")),
      StructField("category", LongType, nullable = true,
        doc("Filer category code")),
      StructField("category_type", LongType, nullable = true,
        doc("Filer category type code")),
      StructField("sub_category", LongType, nullable = true,
        doc("Filer sub-category code")),
      StructField("sub_category_type", LongType, nullable = true,
        doc("Filer sub-category type code")),
      StructField("sub_category_a", StringType, nullable = true,
        doc("Sub-category qualifier")),
      StructField("election_type", LongType, nullable = true,
        doc("Election type code")),
      StructField("effect_dt", DateType, nullable = true,
        doc("Date the assignment took effect, M/D/YYYY in the raw file")),
      StructField("nyq_dt", DateType, nullable = true,
        doc("Next-year qualification date")),
      StructField("party_cd", LongType, nullable = true,
        doc("Political party code of the filer")),
      StructField("county_cd", LongType, nullable = true,
        doc("County code of the filer's residence")),
      StructField("district_cd", LongType, nullable = true,
        doc("District code of the filer's residence")))),
    uniqueKey = Seq("filer_id", "filer_type", "session_id", "effect_dt"),
    dateFields = Seq("effect_dt", "nyq_dt"))

  /** ≙ FILER_TYPE_PERIODS_CD — filing-period assignment per filer type
    * and election type (`models/inactive.py`). */
  val filerTypePeriodsCd: TableDef = TableDef(
    name = "filer_type_periods_cd",
    schema = StructType(Seq(
      StructField("election_type", LongType, nullable = true,
        doc("Election type code")),
      StructField("filer_type", LongType, nullable = true,
        doc("Filer type code, decoded via filer_types_cd")),
      StructField("period_id", LongType, nullable = true,
        doc("Filing period identification number")))),
    uniqueKey = Seq("election_type", "filer_type", "period_id"))

  /** ≙ EFS_FILING_LOG_CD — electronic-filing-system intake log
    * (`models/inactive.py`). */
  val efsFilingLogCd: TableDef = TableDef(
    name = "efs_filing_log_cd",
    schema = StructType(Seq(
      StructField("filing_dt", DateType, nullable = true,
        doc("Date the filing was received, M/D/YYYY in the raw file")),
      StructField("filingstatus", LongType, nullable = true,
        doc("Status code of the intake attempt")),
      StructField("vendor", StringType, nullable = true,
        doc("Software vendor that produced the filing")),
      StructField("filer_id", StringType, nullable = true,
        doc("Filer identification number as filed, free text")),
      StructField("form_type", StringType, nullable = true,
        doc("Name of the source filing form")),
      StructField("error_no", StringType, nullable = true,
        doc("Intake error number; 0 or empty when the filing passed")))),
    uniqueKey = Seq("filing_dt", "filer_id", "form_type"),
    dateFields = Seq("filing_dt"))

  /** ≙ HEADER_CD — form section layout metadata used to render filings
    * (`models/inactive.py`). */
  val headerCd: TableDef = TableDef(
    name = "header_cd",
    schema = StructType(Seq(
      StructField("line_number", LongType, nullable = true,
        doc("Line number of the header row")),
      StructField("form_id", StringType, nullable = true,
        doc("Form identification name the header belongs to")),
      StructField("rec_type", StringType, nullable = true,
        doc("Record type of the header row")),
      StructField("section_label", StringType, nullable = true,
        doc("Label of the form section")),
      StructField("comments1", StringType, nullable = true,
        doc("First comment line of the section")),
      StructField("comments2", StringType, nullable = true,
        doc("Second comment line of the section")),
      StructField("label", StringType, nullable = true,
        doc("Display label of the header")),
      StructField("title", StringType, nullable = true,
        doc("Display title of the header")),
      str("column_a", "Label rendered over amount column A"),
      str("column_b", "Label rendered over amount column B"),
      str("column_c", "Label rendered over amount column C"),
      str("show_b", "Flag: render column B for this section"),
      str("show_c", "Flag: render column C for this section"))),
    uniqueKey = Seq("form_id", "line_number", "rec_type"))

  /** ≙ CVR_F470_CD — cover page of Form 470, the officeholder/candidate
    * short-form campaign statement for filers under the expenditure
    * ceiling (`models/inactive.py`; reconstructed from the public
    * CAL-ACCESS file documentation — SURVEY §0). The standard cover-page
    * shape: filer identity block, contact block, election/office block,
    * plus the Part 5 date-of-$1000 trigger. */
  val cvrF470Cd: TableDef = TableDef(
    name = "cvr_f470_cd",
    schema = StructType(Seq(
      lng("filing_id", "Unique filing identification number"),
      lng("amend_id", "Amendment identification number; 0 is the original"),
      str("rec_type", "Record type of the cover page, always CVR"),
      str("form_type", "Name of the source filing form, always F470"),
      str("filer_id", "Filer identification number as filed"),
      str("entity_cd",
        "Entity code of the filer (documented set in meta.Annotations)"),
      str("filer_naml", "Filer last name or organization name"),
      str("filer_namf", "Filer first name"),
      str("filer_namt", "Filer name title or prefix"),
      str("filer_nams", "Filer name suffix"),
      str("filer_city", "Filer city"),
      str("filer_st", "Filer state"),
      str("filer_zip4", "Filer ZIP+4"),
      str("filer_phon", "Filer phone number"),
      str("filer_fax", "Filer fax number"),
      str("cmtte_id", "Identification number of the controlled committee"),
      str("report_num",
        "Report number; 000 for the original, 001+ for amendments"),
      date("rpt_date", "Date the statement was filed, M/D/YYYY"),
      date("elect_date", "Date of the election, M/D/YYYY"),
      str("office_cd", "Office sought code"),
      str("offic_dscr", "Office sought description"),
      str("juris_cd", "Office jurisdiction code"),
      str("juris_dscr", "Office jurisdiction description"),
      str("dist_no", "Office district number"),
      str("off_s_h_cd", "Office is sought or held code"),
      date("date_1000",
        "Date contributions or expenditures first exceeded $1,000, " +
          "M/D/YYYY (triggers the Part 5 supplement)"))),
    uniqueKey = Seq("filing_id", "amend_id", "rec_type", "form_type"),
    dateFields = Seq("rpt_date", "elect_date", "date_1000"))

  /** ≙ REPORTS_CD — the EFS report-catalog dimension (`models/
    * inactive.py`): one row per canned report the secretary of state's
    * filing system can render. Pure metadata, bounded at dozens of
    * rows. */
  val reportsCd: TableDef = TableDef(
    name = "reports_cd",
    schema = StructType(Seq(
      lng("rpt_id", "Unique report identification number"),
      str("rpt_name", "Name of the report"),
      str("rpt_desc_field", "Description of the report"),
      str("path", "Path to the report template"),
      str("data_object", "Database object the report reads"),
      str("parms_flg_y_n", "Flag: the report takes parameters (Y/N/X)"),
      lng("rpt_type", "Report type code"),
      str("parm_definition", "Parameter definition of the report"))),
    uniqueKey = Seq("rpt_id"))

  val all: Seq[TableDef] =
    Seq(rcptCd, filerFilingsCd, lookupCodesCd, smryCd, filernameCd, expnCd,
      cvrSoCd, loanCd, debtCd, s497Cd, lattCd, lexpCd, lpayCd,
      cvrCampaignDisclosureCd, filerLinksCd, cvrLobbyDisclosureCd,
      filingsCd, hdrCd, textMemoCd, cvr2SoCd, s401Cd, s496Cd, s498Cd,
      spltCd, cvrRegistrationCd, lccmCd, lempCd, lothCd, filerTypesCd,
      legislativeSessionsCd, rawDataVersion, rawDataFile,
      f501502Cd, cvr2CampaignDisclosureCd, cvr2LobbyDisclosureCd,
      lobbyistFirm1Cd, lobbyistEmployer1Cd, lobbyistContributions1Cd,
      filerXrefCd, filerAddressCd, namesCd, ballotMeasuresCd,
      receivedFilingsCd, groupTypesCd,
      cvrE530Cd, f495P2Cd, cvr2RegistrationCd, cvr3VerificationInfoCd,
      lobbyAmendmentsCd, lobbyingChgLogCd, filingPeriodCd, imageLinksCd,
      lobbyistFirm2Cd, lobbyistFirm3Cd, lobbyistEmployer2Cd,
      lobbyistEmployer3Cd, lobbyistContributions2Cd,
      lobbyistContributions3Cd, lobbyistEmpLobbyist1Cd,
      lobbyistEmpLobbyist2Cd, lobbyistFirmEmployer1Cd,
      lobbyistFirmEmployer2Cd, lobbyistFirmLobbyist1Cd,
      lobbyistFirmLobbyist2Cd, lobbyistEmployerFirms1Cd,
      lobbyistEmployerFirms2Cd, lobbyistEmployerHistoryCd,
      lobbyistFirmHistoryCd, f690P2Cd, acronymsCd, addressCd, filersCd,
      filerAcronymsCd, filerEthicsClassCd, filerInterestsCd,
      filerStatusTypesCd, filerToFilerTypeCd, filerTypePeriodsCd,
      efsFilingLogCd, headerCd, cvrF470Cd, reportsCd)

  def byName(name: String): TableDef =
    all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown table: $name"))
}
