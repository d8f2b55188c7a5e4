package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The docs build renders the WHOLE catalog — every table, every
  * documented code set, every filing form — and nothing renders empty
  * (≙ the reference docs site building a page per model/form). Pure
  * string checks; no Spark session. */
class DocsGenSpec extends AnyFunSuite {

  private lazy val doc = DocsGen.render()

  test("every catalog table renders with its width and all its columns") {
    for (t <- graft.schemas.Schemas.all) {
      assert(doc.contains(s"### `${t.name}`"), t.name)
      assert(doc.contains(s"${t.schema.length} columns"), t.name)
    }
    // spot-check full column rendering on the widest and a round-9 table
    for (c <- graft.schemas.Schemas.cvrRegistrationCd.schema.fieldNames)
      assert(doc.contains(s"| `$c` |"), c)
  }

  test("every documented code set and every form renders") {
    for (((t, c), cs) <- graft.meta.Annotations.choices; ch <- cs)
      assert(doc.contains(ch.meaning.replace("|", "\\|").replace("\n", " ")),
        s"$t.$c ${ch.code}")
    for (f <- graft.meta.Annotations.filingForms) {
      assert(doc.contains(s"### ${f.id} — "), f.id)
      for (s <- f.sections)
        assert(doc.contains(s.title.replace("|", "\\|")), s"${f.id}/${s.id}")
    }
  }

  test("committed CATALOG.md matches the registries it claims to render") {
    // the staleness gate: a schema or annotations edit that lands
    // without regenerating (`sbt "runMain graft.tools.DocsGen"`) fails
    // here instead of shipping a dictionary that contradicts the code
    val committed = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("CATALOG.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(committed === doc,
      "CATALOG.md is stale — regenerate with runMain graft.tools.DocsGen")
  }

  test("help_text coverage: every full-width column documents itself") {
    for (t <- graft.meta.Annotations.fullWidthTables; f <- t.schema.fields)
      assert(f.metadata.contains("help_text") &&
        f.metadata.getString("help_text").nonEmpty,
        s"${t.name}.${f.name} has no help_text")
  }
}
