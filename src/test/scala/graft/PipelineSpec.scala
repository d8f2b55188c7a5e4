package graft

import graft.schemas.Schemas
import graft.sources.Archive
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Full pipeline cycle ≙ the reference's end-to-end test strategy
  * (SURVEY §5.1): zip → extract → clean → load → parquet → verify, over
  * the sampled fixture, asserting every model loads and counts match. */
class PipelineSpec extends SparkTestBase {

  private def mkZip(entries: (String, String)*): String = {
    val zipPath = Files.createTempFile("export", ".zip").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(zipPath))
    for ((name, content) <- entries) {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    zipPath
  }

  test("zip extract flattens and filters entries like the reference") {
    val zip = mkZip(
      "CalAccess/DATA/LOOKUP_CODES_CD.TSV" -> "CODE_TYPE\tCODE_ID\tCODE_DESC\n1\t100\tIndividual\n",
      "CalAccess/DATA/README.txt" -> "not a tsv",
      "CalAccess/other/NESTED_CD.TSV" -> "A\tB\tC\n")
    val outDir = Files.createTempDirectory("tsv").toString
    val extracted = Archive.unzip(zip, outDir)
    val names = extracted.map(p => new java.io.File(p).getName).sorted
    assert(names === Seq("LOOKUP_CODES_CD.TSV", "NESTED_CD.TSV"))
  }

  test("Archive.zip → unzip roundtrips content byte-for-byte") {
    val dir = Files.createTempDirectory("zipsrc")
    val contents = Map("a.csv.gz" -> "alpha,1\nbeta,2\n",
      "b.csv.gz" -> "gamma,3\n")
    val files = contents.map { case (n, c) =>
      val p = dir.resolve(n)
      Files.write(p, c.getBytes("UTF-8"))
      p.toString
    }.toSeq.sorted
    val zipPath = dir.resolve("export.zip").toString
    Archive.zip(files, zipPath)
    val outDir = Files.createTempDirectory("zipdst").toString
    val extracted = Archive.unzip(zipPath, outDir, _.endsWith(".csv.gz"))
    assert(extracted.map(p => new java.io.File(p).getName).sorted ===
      contents.keys.toSeq.sorted)
    for (p <- extracted) {
      val name = new java.io.File(p).getName
      assert(new String(Files.readAllBytes(java.nio.file.Paths.get(p)),
        "UTF-8") === contents(name))
    }
  }

  test("full update: zip → extract → clean → load → parquet → verify") {
    val header = "CODE_TYPE\tCODE_ID\tCODE_DESC"
    val zip = mkZip("CalAccess/DATA/LOOKUP_CODES_CD.TSV" ->
      s"$header\n1\t100\tIndividual\n1\t200\tCommittee\nbroken row\n2\t\tEmpty id\n")
    val tsvDir = Files.createTempDirectory("tsv").toString
    val outDir = Files.createTempDirectory("loaded").toString
    val Seq(tsv) = Archive.unzip(zip, tsvDir)

    val results = Pipeline.update(spark,
      Seq(Schemas.lookupCodesCd -> tsv), outDir)
    assert(Pipeline.verify(results))

    val m = results.head.metrics
    assert(m.downloadRecords === 4)
    assert(m.cleanRecords === 3) // "broken row" has 2 fields, not 3
    assert(m.errorRecords === 1)
    assert(m.loadRecords === 3)

    val loaded = spark.read.parquet(s"$outDir/lookup_codes_cd.parquet")
    assert(loaded.schema === Schemas.lookupCodesCd.schema)
    // '' → NULL typed load visible through the sink round-trip
    assert(loaded.filter(col("code_id").isNull).count() === 1)
    // gzip error side-channel written
    val errs = spark.read.option("header", "true")
      .csv(s"$outDir/lookup_codes_cd.errs.csv")
    assert(errs.count() === 1)
  }

  test("a failing table is captured as a named metrics row, the rest " +
      "of the run still completes and verifies") {
    val header = "CODE_TYPE\tCODE_ID\tCODE_DESC"
    val dir = Files.createTempDirectory("failcap").toString
    val goodPath = s"$dir/good.tsv"
    Files.writeString(java.nio.file.Paths.get(goodPath),
      s"$header\n1\t100\tFine\n")
    val tables = Seq(
      Schemas.lookupCodesCd.copy(name = "good") -> goodPath,
      // nonexistent input: the cycle throws instead of producing counts
      Schemas.lookupCodesCd.copy(name = "doomed") ->
        s"$dir/does_not_exist.tsv")
    val out = Files.createTempDirectory("failcapout").toString
    val results = Pipeline.update(spark, tables, out)
    assert(results.map(_.table) === Seq("good", "doomed"))
    val byName = results.map(r => r.table -> r.metrics).toMap
    assert(byName("good").consistent)
    assert(byName("good").failure.isEmpty)
    assert(byName("doomed").failure.isDefined)
    assert(!byName("doomed").consistent)
    // verify fails mechanically because ONE table failed — not silently
    assert(!Pipeline.verify(results))
  }

  test("a straggler table surfaces as a named timeout row instead of " +
      "hanging the refresh") {
    import scala.concurrent.duration._
    val header = "CODE_TYPE\tCODE_ID\tCODE_DESC"
    val dir = Files.createTempDirectory("slowcap").toString
    val p = s"$dir/slow.tsv"
    Files.writeString(java.nio.file.Paths.get(p),
      s"$header\n1\t100\tFine\n")
    val out = Files.createTempDirectory("slowcapout").toString
    // a 1 ns budget no real table cycle can meet: deterministic timeout
    val results = Pipeline.update(spark,
      Seq(Schemas.lookupCodesCd.copy(name = "slow") -> p), out,
      perTableTimeout = 1.nanosecond)
    // either attribution is correct at a 1 ns budget: the task may or
    // may not have claimed its pool slot before the await gave up
    assert(results.head.metrics.failure.exists(m =>
      m.contains("timeout") || m.contains("never started")))
    assert(!Pipeline.verify(results))
  }

  test("multi-table update runs tables concurrently and all verify") {
    val header = "CODE_TYPE\tCODE_ID\tCODE_DESC"
    val dir = Files.createTempDirectory("multi").toString
    val paths = (1 to 3).map { i =>
      val p = s"$dir/t$i.tsv"
      Files.writeString(java.nio.file.Paths.get(p),
        s"$header\n$i\t${i * 100}\tDesc $i\n")
      Schemas.lookupCodesCd.copy(name = s"t$i") -> p
    }
    val out = Files.createTempDirectory("multiout").toString
    val results = Pipeline.update(spark, paths, out)
    assert(results.size === 3)
    assert(Pipeline.verify(results))
  }

  test("updateEpoch: the full monthly run as one call — every table " +
      "a version commit, ONE registry cut, snapshot-mode SQL serves " +
      "the old cut until publish and the new one after, never a mix") {
    import graft.ops.{EpochTable, Snapshot}
    val header = "CODE_TYPE\tCODE_ID\tCODE_DESC"
    val dir = Files.createTempDirectory("mupd").toString
    def month(rows: Int)
        : Seq[(graft.schemas.Schemas.TableDef, String)] =
      (1 to 2).map { i =>
        val p = s"$dir/m${rows}_t$i.tsv"
        Files.writeString(java.nio.file.Paths.get(p),
          (Seq(header) ++ (1 to rows).map(r =>
            s"$i\t${r * 10}\tRow $r")).mkString("\n") + "\n")
        graft.schemas.Schemas.lookupCodesCd.copy(name = s"mt$i") -> p
      }
    val root = Files.createTempDirectory("mupd_root").toString
    val reg = s"$root/_registry"
    // month 0: two tables, one cut
    val r0 = Pipeline.updateEpoch(spark, month(3), root, version = 0L,
      registry = Some(reg))
    assert(r0.size === 2 && Pipeline.verify(r0))
    assert(Snapshot.resolvePins(spark, reg) ===
      Map("mt1" -> 0L, "mt2" -> 0L))
    graft.sources.EpochTableCatalog.register(spark, "gmupd", root,
      registry = Some(reg))
    assert(spark.sql("SELECT * FROM gmupd.mt1").count() === 3L)
    // month 1 loads BOTH tables but the catalog serves the old cut
    // until the registry flips — which updateEpoch does atomically
    val r1 = Pipeline.updateEpoch(spark, month(5), root, version = 1L,
      registry = Some(reg))
    assert(Pipeline.verify(r1))
    assert(spark.sql("SELECT * FROM gmupd.mt1").count() === 5L)
    assert(spark.sql("SELECT * FROM gmupd.mt2").count() === 5L)
    // both monthly versions stay queryable per table
    assert(EpochTable.dataForVersion(spark, s"$root/mt1", 0L)
      .get.count() === 3L)
    // a replayed month is a ledger no-op end-to-end (tables AND registry)
    val epochsBefore = graft.ops.Epoch.committedList(spark, reg)
    Pipeline.updateEpoch(spark, month(5), root, version = 1L,
      registry = Some(reg))
    assert(graft.ops.Epoch.committedList(spark, reg) === epochsBefore)
  }
}
