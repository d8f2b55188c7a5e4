package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pin for `tree_score`: the when/otherwise-compiled ensemble must agree
  * with a reference Scala tree-walk on every document — proving the
  * expression CASE cascade IS the decision tree, not an approximation
  * of it — and the keep/drop cut must split the corpus (non-vacuous). */
class TreeScoreSpec extends SparkTestBase {

  private def refScore(nChars: Long, nToks: Long, nDigit: Long): Long = {
    val avgWlen = (nChars - (nToks - 1)) / nToks // integer division
    val t1 =
      if (nToks < 40) { if (nChars < 150) -30 else -10 }
      else { if (nToks < 90) 15 else 25 }
    val t2 =
      if (avgWlen < 4) { if (nDigit > 5) -20 else 5 }
      else { if (avgWlen < 6) 10 else -5 }
    val t3 =
      if (nDigit == 0) { if (nToks < 60) 0 else 10 }
      else { if (nDigit < 3) 5 else -15 }
    t1 + t2 + t3
  }

  test("expression-compiled ensemble equals the reference tree walk") {
    val sf = "/root/testdata/sf0.01"
    val toks = split(coalesce(col("text"), lit("")), " ")
    val feats = Tables.documents(spark, sf).select(
        col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("c"),
        size(toks).cast("long").as("t"),
        size(filter(toks, x => x.rlike("^[0-9]+$"))).cast("long").as("g"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val scored = graft.SparkEntry.queries("tree_score")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scored.keySet === feats.keySet)
    scored.foreach { case (id, sc) =>
      val (c, t, g) = feats(id)
      assert(sc === refScore(c, t, g), s"doc $id: features ($c,$t,$g)")
    }
    val kept = scored.values.count(_ >= 20)
    assert(kept > 0 && kept < scored.size, "cut must split the corpus")
  }
}
