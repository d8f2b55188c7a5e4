package graft.sources

import graft.SparkTestBase
import graft.schemas.Schemas

class CsvSourceSpec extends SparkTestBase {

  test("PERMISSIVE scan splits parseable and corrupt rows") {
    val res = CsvSource.scan(spark, Schemas.lookupCodesCd,
      resource("lookup_codes_sample.tsv"), header = false)
    assert(res.good.count() === 3)
    assert(res.bad.count() === 0)
    res.unpersist()
  }

  test("rows with excess columns land in the corrupt side-channel") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csvsrc").toString
    Seq("1\t100\tIndividual", "2\t200\tCommittee\textra\tfields")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val res = CsvSource.scan(spark, Schemas.lookupCodesCd, dir,
      header = false)
    assert(res.good.count() === 1)
    assert(res.bad.count() === 1)
    assert(res.bad.head().getString(0).contains("extra"))
    res.unpersist()
  }
}
