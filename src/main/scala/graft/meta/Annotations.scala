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

  /** A page-anchored reference into a published source document
    * (≙ the reference's `annotations/__init__.py` DocumentCloud page
    * references: each form/section cites the official documentation
    * PDF pages that define it). `docId` is the hosting service's
    * document identifier; `startPage`/`endPage` bound the cited range
    * (endPage None = single page). The SEEDS are deliberately empty:
    * the reference's ids name specific documents in the coalition's
    * DocumentCloud account, and reproducing them from uncertain memory
    * would violate the same no-fabrication discipline as
    * [[attestedUndocumentedFormIds]] — attaching one is a one-line
    * seed once confirmed against the published annotations. */
  final case class DocRef(docId: String, startPage: Int,
      endPage: Option[Int] = None) {
    require(startPage >= 1 && endPage.forall(_ >= startPage),
      s"DocRef: invalid page range $startPage..$endPage")
    /** Canonical public page-anchored URL (the DocumentCloud URL
      * scheme the reference's docs link through). */
    def url: String =
      s"https://www.documentcloud.org/documents/$docId/pages/$startPage"
    def pages: Range.Inclusive = startPage to endPage.getOrElse(startPage)
  }

  /** One documented section (schedule/part) of a filing form
    * (≙ `annotations/filing_forms.py` FilingFormSection). */
  final case class FormSection(id: String, title: String,
      docRefs: Seq[DocRef] = Nil)

  /** One filing form (≙ `annotations/filing_forms.py` FilingForm). */
  final case class FilingForm(id: String, title: String,
      sections: Seq[FormSection] = Nil, docRefs: Seq[DocRef] = Nil)

  // ——— shared documented code sets (≙ the reference's choices
  // constants, reused across every model that carries the column; all
  // from the public CAL-ACCESS documentation) ———

  /** Campaign-side ENTITY_CD — who the itemized party is. */
  private val campaignEntity = Seq(
    Choice("BNM", "Ballot measure's name or title"),
    Choice("CAO", "Candidate or officeholder"),
    Choice("COM", "Committee"),
    Choice("CTL", "Controlled committee"),
    Choice("IND", "Individual"),
    Choice("MDI", "Major donor or independent expenditure committee"),
    Choice("OFF", "Officer"),
    Choice("OTH", "Other"),
    Choice("PTY", "Political party"),
    Choice("RCP", "Recipient committee"),
    Choice("SCC", "Small contributor committee"),
    Choice("SMO", "Slate-mailer organization"))

  /** Lobbying-side ENTITY_CD. */
  private val lobbyEntity = Seq(
    Choice("FRM", "Lobbying firm"),
    Choice("IND", "Individual"),
    Choice("LBY", "Lobbyist"),
    Choice("LCO", "Lobbying coalition"),
    Choice("LEM", "Lobbyist employer"),
    Choice("OTH", "Other"))

  private val supOpp = Seq(
    Choice("O", "Opposition"),
    Choice("S", "Support"))

  private val offSoughtHeld = Seq(
    Choice("H", "Office held"),
    Choice("S", "Office sought"))

  private val memoCode = Seq(
    Choice("X", "Memo amount (not included in totals)"))

  /** JURIS_CD — jurisdiction of the office or measure. */
  private val jurisCodes = Seq(
    Choice("ASM", "Assembly district"),
    Choice("BOE", "Board of Equalization district"),
    Choice("CIT", "City"),
    Choice("CTY", "County"),
    Choice("LOC", "Local"),
    Choice("OTH", "Other"),
    Choice("SEN", "Senate district"),
    Choice("STW", "Statewide"))

  /** OFFICE_CD — the statewide offices plus the common local set (the
    * reference documents the same directory; this is the
    * consumption-critical core). */
  private val officeCodes = Seq(
    Choice("APP", "State Appellate Court Justice"),
    Choice("ASM", "State Assembly Person"),
    Choice("ASR", "Assessor"),
    Choice("ATT", "Attorney General"),
    Choice("BED", "Board of Education"),
    Choice("BOE", "Board of Equalization Member"),
    Choice("CAT", "City Attorney"),
    Choice("CCM", "City Council Member"),
    Choice("CON", "State Controller"),
    Choice("COU", "County Counsel"),
    Choice("DAT", "District Attorney"),
    Choice("GOV", "Governor"),
    Choice("INS", "Insurance Commissioner"),
    Choice("LTG", "Lieutenant Governor"),
    Choice("MAY", "Mayor"),
    Choice("OTH", "Other"),
    Choice("SCJ", "Superior Court Judge"),
    Choice("SEN", "State Senator"),
    Choice("SHC", "Sheriff-Coroner"),
    Choice("SOS", "Secretary of State"),
    Choice("SPM", "Supreme Court Justice"),
    Choice("SUP", "Superintendent of Public Instruction"),
    Choice("TRE", "State Treasurer"))

  /** RCPT_CD TRAN_TYPE — receipt transaction subtypes. */
  private val tranType = Seq(
    Choice("F", "Forgiven loan"),
    Choice("I", "Intermediary"),
    Choice("R", "Returned"),
    Choice("T", "Third-party repayment"),
    Choice("X", "Transfer"))

  private val actvtyLvl = Seq(
    Choice("CI", "City"),
    Choice("CO", "County"),
    Choice("ST", "State"))

  /** The eighteen full-width tables that carry closed-set columns
    * (SchemasSpec pins their widths) — the scope the shared sets below
    * are seeded against, and the scope the completeness test in
    * AnnotationsSpec checks. (filername_cd / filer_links_cd /
    * text_memo_cd are also full-width but carry no choices-bearing
    * columns.) */
  val fullWidthTables: Seq[TableDef] = {
    import graft.schemas.Schemas._
    Seq(rcptCd, expnCd, cvrCampaignDisclosureCd, filerFilingsCd, s497Cd,
      s496Cd, loanCd, debtCd, smryCd, cvrSoCd, s401Cd, s498Cd, lexpCd,
      lpayCd, lccmCd, cvr2SoCd, cvrLobbyDisclosureCd, cvrRegistrationCd)
  }

  /** Seed `cs` for every listed table that actually declares `colName` —
    * existence-filtered so a documented code can never point at a
    * column its schema lacks (the invariant AnnotationsSpec pins). */
  private def shared(colName: String, cs: Seq[Choice],
      tables: Seq[TableDef]): Seq[((String, String), Seq[Choice])] =
    tables.filter(_.schema.fieldNames.contains(colName))
      .map(t => (t.name, colName) -> cs)

  private val lobbyTables = {
    import graft.schemas.Schemas._
    Seq(lexpCd, lpayCd, lccmCd, cvrLobbyDisclosureCd, cvrRegistrationCd)
  }
  private val campaignTables =
    fullWidthTables.filterNot(lobbyTables.contains)

  /** REC_TYPE is a single documented constant per table. */
  private val recTypes: Seq[((String, String), Seq[Choice])] = {
    import graft.schemas.Schemas._
    Seq(rcptCd -> "RCPT", expnCd -> "EXPN", loanCd -> "LOAN",
      debtCd -> "DEBT", s496Cd -> "S496", s497Cd -> "S497",
      s498Cd -> "S498", s401Cd -> "S401", smryCd -> "SMRY",
      cvrSoCd -> "CVR", cvrCampaignDisclosureCd -> "CVR",
      cvr2SoCd -> "CVR2",
      cvrLobbyDisclosureCd -> "CVR", cvrRegistrationCd -> "CVR",
      cvr2CampaignDisclosureCd -> "CVR2", cvr2LobbyDisclosureCd -> "CVR2",
      cvr2RegistrationCd -> "CVR2",
      lexpCd -> "LEXP", lpayCd -> "LPAY", lccmCd -> "LCCM")
      .filter(_._1.schema.fieldNames.contains("rec_type"))
      .map { case (t, v) =>
        (t.name, "rec_type") -> Seq(Choice(v, s"Record type, always $v"))
      }
  }

  /** FORM_TYPE — which form/schedule an itemized record was filed on.
    * Per-table closed sets from the public CAL-ACCESS documentation;
    * the schedule/part meanings double as the S-schedule descriptions
    * of `annotations/filing_forms.py`. Tables whose documented sets are
    * less certain from public memory (e.g. SMRY_CD, which mixes form
    * ids with bare schedule letters) are deliberately left unseeded
    * rather than guessed. */
  private val formTypes: Seq[((String, String), Seq[Choice])] = {
    import graft.schemas.Schemas._
    Seq(
      rcptCd -> Seq(
        Choice("A", "Schedule A: Monetary Contributions Received"),
        Choice("C", "Schedule C: Nonmonetary Contributions Received"),
        Choice("I", "Schedule I: Miscellaneous Increases to Cash"),
        Choice("F496P3",
          "Form 496 Part 3: Contributions of $100 or More Received")),
      expnCd -> Seq(
        Choice("D", "Schedule D: Summary of Expenditures Supporting/" +
          "Opposing Other Candidates, Measures and Committees"),
        Choice("E", "Schedule E: Payments Made"),
        Choice("G",
          "Schedule G: Payments Made by an Agent or Independent Contractor"),
        Choice("F450P5", "Form 450 Part 5: Payments Made"),
        Choice("F461P5",
          "Form 461 Part 5: Contributions and Expenditures Made"),
        Choice("F465P3", "Form 465 Part 3: Independent Expenditures Made"),
        Choice("F900", "Form 900: Public Employee's Retirement Board " +
          "Candidate Campaign Statement")),
      loanCd -> Seq(
        Choice("B1", "Schedule B Part 1: Loans Received"),
        Choice("B2", "Schedule B Part 2: Loan Guarantors"),
        Choice("H", "Schedule H: Loans Made to Others")),
      debtCd -> Seq(
        Choice("F", "Schedule F: Accrued Expenses (Unpaid Bills)")),
      s496Cd -> Seq(
        Choice("F496", "Form 496: Late Independent Expenditure Report")),
      s497Cd -> Seq(
        Choice("F497P1", "Form 497 Part 1: Contributions Received"),
        Choice("F497P2", "Form 497 Part 2: Contributions Made")),
      s498Cd -> Seq(
        Choice("F498-A", "Form 498 Part A: Late Payment(s) Received"),
        Choice("F498-R", "Form 498 Part R: Late Payment(s) Returned")),
      s401Cd -> Seq(
        Choice("F401A", "Form 401 Schedule A: Payments Received"),
        Choice("F401B", "Form 401 Schedule B: Payments Made"),
        Choice("F401C",
          "Form 401 Schedule C: Persons Receiving $1,000 or More"),
        Choice("F401D", "Form 401 Schedule D: Candidates and Measures " +
          "Not Listed on Schedule A")),
      cvrSoCd -> Seq(
        Choice("F400", "Statement of Organization " +
          "(Slate Mailer Organization)"),
        Choice("F402", "Statement of Termination " +
          "(Slate Mailer Organization)"),
        Choice("F410", "Statement of Organization Recipient Committee")),
      cvr2SoCd -> Seq(
        Choice("F400", "Statement of Organization " +
          "(Slate Mailer Organization)"),
        Choice("F410", "Statement of Organization Recipient Committee")),
      cvrCampaignDisclosureCd -> Seq(
        Choice("F401", "Slate Mailer Organization Campaign Statement"),
        Choice("F425", "Semi-Annual Statement of No Activity"),
        Choice("F450", "Recipient Committee Campaign Disclosure " +
          "Statement - Short Form"),
        Choice("F460", "Recipient Committee Campaign Statement"),
        Choice("F461", "Independent Expenditure Committee & Major Donor " +
          "Committee Campaign Statement"),
        Choice("F465", "Supplemental Independent Expenditure Report"),
        Choice("F496", "Late Independent Expenditure Report"),
        Choice("F497", "Late Contribution Report"),
        Choice("F498", "Slate Mailer Late Payment Report")),
      cvrLobbyDisclosureCd -> Seq(
        Choice("F615", "Lobbyist Report"),
        Choice("F625", "Report of Lobbying Firm"),
        Choice("F635", "Report of Lobbyist Employer and Report of " +
          "Lobbying Coalition"),
        Choice("F645", "Report of Person Spending $5,000 or More")),
      // F605 amendments arrive as AMEND_ID increments on the original
      // form, not as an F605 FORM_TYPE — deliberately absent here.
      cvrRegistrationCd -> Seq(
        Choice("F601", "Lobbying Firm Registration Statement"),
        Choice("F602", "Lobbying Firm Activity Authorization"),
        Choice("F603", "Lobbyist Employer/Lobbying Coalition " +
          "Registration Statement"),
        Choice("F604", "Lobbyist Certification Statement"),
        Choice("F606", "Notice of Termination"),
        Choice("F607", "Notice of Withdrawal")),
      lexpCd -> Seq(
        Choice("F615P1", "Form 615 Part 1: Activity Expenses"),
        Choice("F625P3A", "Form 625 Part 3A: Activity Expenses"),
        Choice("F635P3C", "Form 635 Part 3C: Activity Expenses"),
        Choice("F645P2A", "Form 645 Part 2A: Activity Expenses")),
      lpayCd -> Seq(
        Choice("F625P2", "Form 625 Part 2: Payments Received in " +
          "Connection with Lobbying Activity"),
        Choice("F635P3B", "Form 635 Part 3B: Payments to Lobbying Firms")),
      // the F625/F635/F645 contribution part codes are less certain
      // from public memory — only the confident F615 part is seeded.
      lccmCd -> Seq(
        Choice("F615P2",
          "Form 615 Part 2: Campaign Contributions Made or Delivered")),
      // CVR2 continuation pages: the forms they extend. The campaign
      // page serves the committee-statement family; the registration
      // page's F602/F604 applicability is less certain, so only the
      // firm/employer registrations are seeded.
      cvr2CampaignDisclosureCd -> Seq(
        Choice("F450", "Recipient Committee Campaign Disclosure " +
          "Statement - Short Form"),
        Choice("F460", "Recipient Committee Campaign Statement"),
        Choice("F461", "Independent Expenditure Committee & Major Donor " +
          "Committee Campaign Statement"),
        Choice("F465", "Supplemental Independent Expenditure Report")),
      cvr2LobbyDisclosureCd -> Seq(
        Choice("F615", "Lobbyist Report"),
        Choice("F625", "Report of Lobbying Firm"),
        Choice("F635", "Report of Lobbyist Employer and Report of " +
          "Lobbying Coalition"),
        Choice("F645", "Report of Person Spending $5,000 or More")),
      cvr2RegistrationCd -> Seq(
        Choice("F601", "Lobbying Firm Registration Statement"),
        Choice("F603", "Lobbyist Employer/Lobbying Coalition " +
          "Registration Statement")))
      .filter(_._1.schema.fieldNames.contains("form_type"))
      .map { case (t, cs) => (t.name, "form_type") -> cs }
  }

  /** (table, column) → documented choices. */
  val choices: Map[(String, String), Seq[Choice]] = Map(
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
      Choice("O", "OPEN")),
    ("orders", "o_orderstatus") -> Seq(
      Choice("F", "FULFILLED"),
      Choice("O", "OPEN"),
      Choice("P", "PARTIAL"))) ++
    shared("entity_cd", campaignEntity, campaignTables) ++
    shared("entity_cd", lobbyEntity, lobbyTables) ++
    // the CVR2 campaign continuation page shares the universal office/
    // jurisdiction/support-oppose sets (its ENTITY_CD family differs —
    // officer/treasurer codes — and stays deliberately unseeded)
    shared("sup_opp_cd", supOpp,
      fullWidthTables :+ graft.schemas.Schemas.cvr2CampaignDisclosureCd) ++
    shared("off_s_h_cd", offSoughtHeld,
      fullWidthTables :+ graft.schemas.Schemas.cvr2CampaignDisclosureCd) ++
    shared("memo_code", memoCode, fullWidthTables) ++
    shared("juris_cd", jurisCodes,
      fullWidthTables :+ graft.schemas.Schemas.cvr2CampaignDisclosureCd) ++
    shared("office_cd", officeCodes,
      fullWidthTables ++ Seq(graft.schemas.Schemas.cvr2CampaignDisclosureCd,
        // the E530 cover page declares the universal office set for the
        // candidate the late report concerns
        graft.schemas.Schemas.cvrE530Cd)) ++
    shared("tran_type", tranType,
      Seq(graft.schemas.Schemas.rcptCd)) ++
    shared("actvty_lvl", actvtyLvl,
      Seq(graft.schemas.Schemas.cvrSoCd)) ++
    recTypes ++ formTypes

  /** Choices for one column, sorted by code — ≙ `get_sorted_choices`
    * (the reference sorts so docs and admin render deterministically). */
  def sortedChoices(table: String, column: String): Seq[Choice] =
    choices.getOrElse((table, column),
      throw new IllegalArgumentException(
        s"no documented choices for $table.$column"))
      .sortBy(_.code)

  /** The filing-form directory (≙ `annotations/filing_forms.py`): id,
    * title, and the itemization sections (schedules/parts) the form
    * carries, each with its documented description. Breadth covers
    * every form the CAL-ACCESS tables reference by FORM_TYPE plus the
    * lobbying attachments; sections are the stable public FPPC
    * schedule facts. */
  val filingForms: Seq[FilingForm] = Seq(
    FilingForm("E530", "Issue Advocacy Report"),
    FilingForm("F405", "Amendment to Campaign Disclosure Statement"),
    FilingForm("F419", "Ballot Measure Committee Campaign Statement"),
    FilingForm("F400", "Statement of Organization (Slate Mailer Organization)"),
    FilingForm("F401", "Slate Mailer Organization Campaign Statement", Seq(
      FormSection("A", "Payments Received"),
      FormSection("A-1",
        "Payments Received on Behalf of the Slate Mailer Organization"),
      FormSection("B", "Payments Made"),
      FormSection("B-1",
        "Payments Made by an Agent or Independent Contractor"),
      FormSection("C", "Persons Receiving $1,000 or More"),
      FormSection("D", "Candidates and Measures Not Listed on Schedule A"))),
    FilingForm("F402",
      "Statement of Termination (Slate Mailer Organization)"),
    FilingForm("F410", "Statement of Organization Recipient Committee"),
    FilingForm("F425", "Semi-Annual Statement of No Activity"),
    FilingForm("F450",
      "Recipient Committee Campaign Disclosure Statement - Short Form",
      Seq(FormSection("P5", "Payments Made"))),
    FilingForm("F460", "Recipient Committee Campaign Statement", Seq(
      FormSection("A", "Monetary Contributions Received"),
      FormSection("B1", "Loans Received"),
      FormSection("B2", "Loan Guarantors"),
      FormSection("C", "Nonmonetary Contributions Received"),
      FormSection("D", "Summary of Expenditures Supporting/Opposing " +
        "Other Candidates, Measures and Committees"),
      FormSection("E", "Payments Made"),
      FormSection("F", "Accrued Expenses (Unpaid Bills)"),
      FormSection("G",
        "Payments Made by an Agent or Independent Contractor"),
      FormSection("H", "Loans Made to Others"),
      FormSection("I", "Miscellaneous Increases to Cash"))),
    FilingForm("F461",
      "Independent Expenditure Committee & Major Donor Committee Campaign Statement",
      Seq(FormSection("P5", "Contributions and Expenditures Made"))),
    FilingForm("F465", "Supplemental Independent Expenditure Report",
      Seq(FormSection("P3", "Independent Expenditures Made"))),
    FilingForm("F470",
      "Officeholder and Candidate Campaign Statement, Short Form"),
    FilingForm("F470S",
      "Officeholder and Candidate Campaign Statement Supplement"),
    FilingForm("F495", "Supplemental Preelection Campaign Statement",
      Seq(FormSection("P2", "Contributions Received"))),
    FilingForm("F496", "Late Independent Expenditure Report",
      Seq(FormSection("P3", "Contributions of $100 or More Received"))),
    FilingForm("F497", "Late Contribution Report", Seq(
      FormSection("P1", "Contributions Received"),
      FormSection("P2", "Contributions Made"))),
    FilingForm("F498", "Slate Mailer Late Payment Report", Seq(
      FormSection("A", "Late Payment(s) Received"),
      FormSection("R", "Late Payment(s) Returned"))),
    FilingForm("F501", "Candidate Intention Statement"),
    FilingForm("F502", "Campaign Bank Account Statement"),
    FilingForm("F511", "Paid Spokesperson Report"),
    FilingForm("F601", "Lobbying Firm Registration Statement", Seq(
      FormSection("P2A", "Lobbyist Employers"),
      FormSection("P2B", "Subcontracted Clients"))),
    FilingForm("F602", "Lobbying Firm Activity Authorization"),
    FilingForm("F603",
      "Lobbyist Employer/Lobbying Coalition Registration Statement"),
    FilingForm("F604", "Lobbyist Certification Statement"),
    FilingForm("F605",
      "Amendment to Registration, Lobbying Firm, Lobbyist Employer, Lobbying Coalition"),
    FilingForm("F606", "Notice of Termination"),
    FilingForm("F607", "Notice of Withdrawal"),
    FilingForm("F615", "Lobbyist Report", Seq(
      FormSection("P1", "Activity Expenses Paid, Incurred, Arranged or " +
        "Provided by the Lobbyist"),
      FormSection("P2", "Campaign Contributions Made or Delivered"))),
    FilingForm("F625", "Report of Lobbying Firm", Seq(
      FormSection("P2",
        "Payments Received in Connection with Lobbying Activity"),
      FormSection("P3A", "Activity Expenses"),
      FormSection("P3B", "Payments Made to Other Lobbying Firms"))),
    FilingForm("F630", "Payments Made to Lobbying Coalitions"),
    FilingForm("F635",
      "Report of Lobbyist Employer and Report of Lobbying Coalition", Seq(
      FormSection("P3A", "Payments to In-House Employee Lobbyists"),
      FormSection("P3B", "Payments to Lobbying Firms"),
      FormSection("P3C", "Activity Expenses"),
      FormSection("P3D", "Other Payments to Influence Legislative or " +
        "Administrative Action"))),
    FilingForm("F635C", "Payments Received by Lobbying Coalitions"),
    FilingForm("F640",
      "Governmental Agencies Reporting (Attachment to Form 635 or Form 645)"),
    FilingForm("F645", "Report of Person Spending $5,000 or More", Seq(
      FormSection("P2A", "Activity Expenses"),
      FormSection("P2B", "Other Payments to Influence Legislative or " +
        "Administrative Action"),
      FormSection("P3", "Campaign Contributions Made"))),
    FilingForm("F690", "Amendment to Lobbying Disclosure Report"),
    FilingForm("F700", "Statement of Economic Interests"),
    FilingForm("F900",
      "Public Employee's Retirement Board Candidate Campaign Statement"))

  /** Legacy FORM_ID values attested in public CAL-ACCESS filing data
    * (paper-era campaign forms superseded around the 2000 online-filing
    * transition) whose official titles we deliberately do NOT reproduce
    * from uncertain memory — the same no-fabrication discipline as the
    * schema-widening tiers. A user hitting one of these ids in
    * FILER_FILINGS gets an "attested but undocumented" answer instead
    * of a silently wrong title; promoting one to [[filingForms]] is a
    * one-line change once its title is confirmed against the official
    * form directory. AnnotationsSpec pins that this tier never overlaps
    * the documented directory. */
  val attestedUndocumentedFormIds: Seq[String] =
    Seq("F415", "F416", "F420", "F421", "F430", "F440", "F490")

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

  /** Filing-form directory → DataFrame (section ids joined for scalar
    * hashing). */
  def formsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    filingForms.map(f =>
        (f.id, f.title, f.sections.map(_.id).mkString(","), f.sections.size))
      .toDF("form_id", "title", "sections", "n_sections")
  }

  /** Page-reference directory → DataFrame: one row per (form, section,
    * ref) with the rendered public URL — the doc-link dimension the
    * reference's annotation layer feeds its documentation site from.
    * Empty until refs are seeded (see [[DocRef]]'s no-fabrication
    * note); the schema and rendering are the stable surface. */
  def docRefsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    filingForms.flatMap { f =>
      f.docRefs.map(r => (f.id, None: Option[String], r.docId,
        r.startPage, r.endPage, r.url)) ++
        f.sections.flatMap(sec => sec.docRefs.map(r =>
          (f.id, Some(sec.id), r.docId, r.startPage, r.endPage, r.url)))
    }.toDF("form_id", "section_id", "doc_id", "start_page", "end_page",
      "url")
  }

  /** Base form id of a FORM_TYPE code: `F496P3` → `F496`, `F498-A` →
    * `F498`, bare schedule letters (`A`, `B1`, `F`) → None. The spec
    * uses this to assert every form-referencing FORM_TYPE choice
    * resolves in [[filingForms]]. */
  def baseFormId(formType: String): Option[String] =
    "^([EF]\\d+)".r.findFirstIn(formType)

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
