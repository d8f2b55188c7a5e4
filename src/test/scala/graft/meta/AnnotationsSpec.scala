package graft.meta

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The annotations registry (≙ the reference's documented-choices +
  * filing-form layer): registry integrity, the seeded dimension's
  * declared schema, and the equivalence of the two decode shapes. */
class AnnotationsSpec extends SparkTestBase {

  test("choice lists are non-empty, code-unique, and sorted access works") {
    for (((t, c), cs) <- Annotations.choices) {
      assert(cs.nonEmpty, s"$t.$c empty")
      assert(cs.map(_.code).distinct.size === cs.size, s"$t.$c dup codes")
      val sorted = Annotations.sortedChoices(t, c)
      assert(sorted.map(_.code) === sorted.map(_.code).sorted)
    }
    intercept[IllegalArgumentException] {
      Annotations.sortedChoices("nope", "nothing")
    }
  }

  test("doc refs validate page ranges, render the public URL scheme, " +
      "and the directory frame carries the declared columns") {
    val r = Annotations.DocRef("0000000-example-doc", 8, Some(10))
    assert(r.url ===
      "https://www.documentcloud.org/documents/0000000-example-doc/pages/8")
    assert(r.pages === (8 to 10))
    assert(Annotations.DocRef("d", 3).pages === (3 to 3))
    intercept[IllegalArgumentException] { Annotations.DocRef("d", 0) }
    intercept[IllegalArgumentException] {
      Annotations.DocRef("d", 5, Some(4))
    }
    val df = Annotations.docRefsDf(spark)
    assert(df.columns.toSeq === Seq("form_id", "section_id", "doc_id",
      "start_page", "end_page", "url"))
    // seeds stay empty until confirmed against the published
    // annotations — the no-fabrication discipline
    assert(df.count() === 0)
  }

  test("filing-form directory has unique ids and non-empty titles") {
    val ids = Annotations.filingForms.map(_.id)
    assert(ids.distinct.size === ids.size)
    assert(ids.size === 38) // the documented breadth as of round 10
    assert(Annotations.filingForms.forall(_.title.nonEmpty))
    assert(Annotations.formById("F460").title
      .contains("Recipient Committee Campaign Statement"))
    intercept[IllegalArgumentException] { Annotations.formById("F999") }
  }

  test("attested-but-undocumented form ids never shadow the directory") {
    // The no-fabrication tier: legacy FORM_IDs known to occur in public
    // filing data but whose titles aren't confidently sourced. They must
    // stay disjoint from the documented directory (promotion = move the
    // id over WITH a confirmed title) and look like form ids.
    val attested = Annotations.attestedUndocumentedFormIds
    assert(attested.nonEmpty)
    assert(attested.distinct.size === attested.size)
    assert(attested.forall(_.matches("^[EF]\\d+$")))
    val documented = Annotations.filingForms.map(_.id).toSet
    assert(attested.forall(id => !documented.contains(id)),
      attested.filter(documented.contains).mkString(", "))
    // the meta_forms oracle HARD-CODES n_reffing_tables = 0 for this
    // tier; enforce the same invariant at test time so a FORM_TYPE
    // choice referencing an attested-only id fails here, not in the
    // driver's hash compare (promotion pressure with a fast signal)
    val referenced = Annotations.choices.toSeq
      .collect { case ((_, "form_type"), cs) => cs.map(_.code) }
      .flatten
      .flatMap("^([EF]\\d+)".r.findFirstIn(_))
      .toSet
    assert(attested.forall(id => !referenced.contains(id)),
      s"attested ids referenced by documented FORM_TYPE choices " +
        s"(promote them): ${attested.filter(referenced.contains).mkString(", ")}")
  }

  test("form sections carry unique ids and documented descriptions") {
    val sections = Annotations.filingForms.flatMap(f =>
      f.sections.map(s => (f.id, s.id)))
    assert(sections.distinct.size === sections.size)
    assert(sections.size === 39) // schedule/part breadth as of round 9
    assert(Annotations.filingForms.forall(_.sections.forall(_.title.nonEmpty)))
    // the F460 schedule letters are the canonical public set
    assert(Annotations.formById("F460").sections.map(_.id) ===
      Seq("A", "B1", "B2", "C", "D", "E", "F", "G", "H", "I"))
  }

  test("every form-referencing FORM_TYPE choice resolves in the directory") {
    // ≙ the reference's forms↔models cross-links: a documented FORM_TYPE
    // code like F496P3 or F498-A must lead back to a filing form the
    // directory knows; bare schedule letters (A, B1, F, ...) resolve as
    // sections of the form family instead and carry no base id.
    val formTypeChoices = Annotations.choices.collect {
      case ((t, "form_type"), cs) => t -> cs
    }
    assert(formTypeChoices.size === 19) // full-width minus smry_cd (mixed
    // form/schedule set, deliberately unseeded) and filer_filings_cd
    // (carries form_id, not form_type), plus the three CVR2
    // continuation pages
    for ((t, cs) <- formTypeChoices; c <- cs;
         base <- Annotations.baseFormId(c.code)) {
      assert(Annotations.filingForms.exists(_.id == base),
        s"$t.form_type code ${c.code} references unknown form $base")
    }
    // spot checks on the base-id extraction itself
    assert(Annotations.baseFormId("F496P3") === Some("F496"))
    assert(Annotations.baseFormId("F498-A") === Some("F498"))
    assert(Annotations.baseFormId("E530") === Some("E530"))
    assert(Annotations.baseFormId("B1") === None)
  }

  test("decodeExpr over the campaign entity set resolves every documented code") {
    import spark.implicits._
    val codes = Annotations.sortedChoices("rcpt_cd", "entity_cd")
    val df = (codes.map(_.code) :+ "ZZZ").toDF("entity_cd")
      .select(col("entity_cd"),
        Annotations.decodeExpr("rcpt_cd", "entity_cd",
          col("entity_cd")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (c <- codes) assert(df(c.code) === c.meaning)
    assert(df("ZZZ") === "UNKNOWN")
  }

  test("every CAL-ACCESS choices key points at a real column of its schema") {
    // ≙ tests/test_models.py direction 1: a documented code's column
    // must exist on the model it claims to annotate. (Testdata analogs
    // like lineitem/orders aren't in the CAL-ACCESS catalog and are
    // covered by the correctness gate instead.)
    val catalog = graft.schemas.Schemas.all.map(t => t.name -> t).toMap
    for (((t, c), _) <- Annotations.choices; tdef <- catalog.get(t))
      assert(tdef.schema.fieldNames.contains(c),
        s"choices key $t.$c references a column absent from the schema")
  }

  test("every choices-bearing column of the full-width tables is documented") {
    // ≙ tests/test_models.py direction 2: the closed-set columns of the
    // full-width tables must each carry ≥1 documented code.
    val bearing = Set("rec_type", "entity_cd", "sup_opp_cd", "off_s_h_cd",
      "memo_code", "juris_cd", "office_cd", "tran_type", "actvty_lvl")
    assert(Annotations.fullWidthTables.size === 18)
    for (t <- Annotations.fullWidthTables; f <- t.schema.fieldNames
         if bearing(f)) {
      assert(Annotations.choices.contains((t.name, f)),
        s"${t.name}.$f has no documented choices")
      assert(Annotations.choices((t.name, f)).nonEmpty,
        s"${t.name}.$f documented but empty")
    }
    // the shared sets landed where expected
    assert(Annotations.choices(("rcpt_cd", "entity_cd")).size === 12)
    assert(Annotations.choices(("lpay_cd", "entity_cd")).map(_.code)
      .contains("FRM"))
    assert(Annotations.choices(("cvr_so_cd", "rec_type")).head.code === "CVR")
  }

  test("choicesDf rows match the registry and the declared TableDef schema") {
    val df = Annotations.choicesDf(spark)
    assert(df.columns.toSeq ===
      Annotations.choiceCodesDef.schema.fieldNames.toSeq)
    assert(df.count() === Annotations.choices.values.map(_.size).sum)
    // unique on the declared key
    assert(df.select(Annotations.choiceCodesDef.uniqueKey.map(col): _*)
      .distinct().count() === df.count())
  }

  test("when-chain decode equals broadcast-join decode") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf)
    val viaExpr = li.select(
      Annotations.decodeExpr("lineitem", "l_returnflag",
        col("l_returnflag")).as("m"))
      .groupBy("m").count().orderBy("m").collect().toSeq
    val dim = broadcast(Annotations.choicesDf(spark)
      .filter(col("table_name") === "lineitem" &&
        col("column_name") === "l_returnflag")
      .select(col("code"), col("meaning")))
    val viaJoin = li.join(dim, col("l_returnflag") === col("code"), "left")
      .select(coalesce(col("meaning"), lit("UNKNOWN")).as("m"))
      .groupBy("m").count().orderBy("m").collect().toSeq
    assert(viaExpr === viaJoin)
  }
}
