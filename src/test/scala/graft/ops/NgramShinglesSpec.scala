package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property pin for the `ngramShingles` zip_with cascade: for ANY token
  * sequence and any n, the cascade equals the obvious sliding-window
  * reference (`tokens.sliding(n)`), including the degenerate cases the
  * cascade guards (fewer than n tokens ⇒ empty, never a descending
  * `sequence`). This is the contract the decontamination and repetition
  * queries' oracles rely on. */
class NgramShinglesSpec extends SparkTestBase {

  private val wordGen: Gen[String] =
    Gen.oneOf("key", "agg", "row", "scan", "slow", "fast", "a", "the")

  private val docGen: Gen[List[String]] =
    Gen.chooseNum(0, 24).flatMap(k => Gen.listOfN(k, wordGen))

  test("ngramShingles equals sliding-window reference for n in 2..6") {
    import spark.implicits._
    // collect a deterministic batch of generated docs, run ONE Spark job
    // per n over all of them, compare row-by-row to tokens.sliding(n)
    val params = SCTest.Parameters.default.withInitialSeed(
      org.scalacheck.rng.Seed(7L))
    val docs: Seq[String] = {
      val it = Iterator.iterate(org.scalacheck.rng.Seed(7L))(_.next)
      it.take(120).map(s => docGen(Gen.Parameters.default, s)
        .getOrElse(Nil).mkString(" ")).toSeq
    }
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- 2 to 6) {
      val got = df.select(col("id"),
        TextQueries.ngramShingles(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
        .toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ", -1).toSeq
        val expect =
          if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(got(i.toLong) === expect, s"n=$n doc=$i text='$t'")
      }
    }
  }

  test("ngramShingles rejects n < 2") {
    intercept[IllegalArgumentException] {
      TextQueries.ngramShingles(col("text"), 1)
    }
  }
}
