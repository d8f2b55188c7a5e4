package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins the two properties the oracle can't see in isolation:
  * the pigeonhole banding has FULL recall at hamming ≤ bands−1 (the
  * banded join equals the brute-force join), and the physical plan is a
  * band equi-join, never a cartesian product. */
class SimhashJoinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("banded hamming join equals brute-force pairs at d <= 3") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val sigs = docs.select(col("doc_id"),
      DedupQueries.simhash32Portable(
        array_distinct(split(col("text"), " "))).as("sig"))
    val a = sigs.select(col("doc_id").as("ida"), col("sig").as("siga"))
    val b = sigs.select(col("doc_id").as("idb"), col("sig").as("sigb"))
    val brute = a.join(b, col("ida") < col("idb"))
      .filter(bit_count(col("siga").bitwiseXOR(col("sigb"))) <= 3)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val banded = DedupQueries.dedupSimhashJoin
      .fn(spark, sf).filter(col("ida") < 200) // query pins doc_id < 100
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val bruteUnder100 = brute.filter { case (x, y) => x < 100 && y < 100 }
    assert(banded == bruteUnder100,
      s"banding must lose nothing at d<=3: missing=${bruteUnder100 -- banded}")
  }

  test("candidate generation is a band equi-join — no cartesian product") {
    val plan = DedupQueries.dedupSimhashJoin
      .fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
