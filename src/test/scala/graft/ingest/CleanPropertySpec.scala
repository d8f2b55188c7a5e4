package graft.ingest

import graft.SparkTestBase
import graft.schemas.Schemas
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the clean layer (SURVEY §5.2.3): for ANY batch of
  * raw lines, the good/bad split is disjoint and exhaustive, and good
  * rows always parse to exactly the declared column count with control
  * characters scrubbed. Uses scalacheck directly (no scalatestplus
  * bridge — offline env). */
class CleanPropertySpec extends SparkTestBase {

  private val table = Schemas.lookupCodesCd // 3 declared columns

  private val fieldGen: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.const("\rcr"), Gen.const("\u0000nul"))

  private val lineGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 6)
    fs <- Gen.listOfN(n, fieldGen)
  } yield fs.mkString("\t")

  private def holds(p: Prop): Boolean = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(10)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    SCTest.check(params, p).passed
  }

  test("good+bad is a disjoint, exhaustive partition for arbitrary input") {
    assert(holds(Prop.forAll(Gen.listOfN(30, lineGen)) { lines =>
      import spark.implicits._
      val res = Clean.clean(table, lines.toDF("value"))
      res.good.count() + res.bad.count() == lines.size.toLong
    }))
  }

  test("every good row has the declared column count, control chars scrubbed") {
    assert(holds(Prop.forAll(Gen.listOfN(30, lineGen)) { lines =>
      import spark.implicits._
      val res = Clean.clean(table, lines.toDF("value"))
      res.good.collect().forall { r =>
        r.length == table.schema.fields.length &&
        (0 until r.length).forall { i =>
          val v = Option(r.getString(i)).getOrElse("")
          !v.contains("\u0000") && !v.contains("\r")
        }
      }
    }))
  }
}
