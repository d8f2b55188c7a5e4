package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Near-dup SERVE face on epochs (round-16 verdict "next" #2): a probe
  * reader racing an append+compact sees wholly-old or wholly-new
  * segments, never mixed; delete + compact equal the survivors
  * rebuild; replays are ledger no-ops; the re-add gate holds against
  * the PINNED tombstone set. The ingest gate (NearDup.ingestBatch)
  * stays on the swap layout's latest-state reads — untouched here. */
class EpochNearDupSpec extends SparkTestBase {

  import spark.implicits._

  // two planted near-dup families: probe doc 1000 shares almost all
  // bigrams with docs 1..20 (old half) and 101..120 (new half)
  private def family(ids: Seq[Long], stem: String) =
    ids.map(i => (i, s"$stem common words shared across the family $stem"))

  private val oldDocs = family(1L to 20L, "alpha") ++
    Seq((50L, "totally unrelated text about nothing at all here"))
  private val newDocs = family(101L to 120L, "alpha")

  private def probes =
    Seq((1000L, "alpha common words shared across the family alpha"))
      .toDF("doc_id", "text")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(1)).toSet

  test("a probe racing append+compact sees wholly-old or wholly-new; " +
      "a pinned manifest survives the mutations") {
    val path = s"${graft.GraftSession.scratchDir}/nde_race"
    build(path, oldDocs)
    val m0 = Epoch.resolve(spark, path).get
    val r0 = pairs(EpochNearDup.serve(spark, path, probes))
    assert(r0 === (1L to 20L).toSet)
    val r1 = r0 ++ (101L to 120L).toSet
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val mutator = Future {
        EpochNearDup.append(spark, newDocs.toDF("doc_id", "text"), path,
          batchId = 1L)
        EpochNearDup.compact(spark, path)
      }
      var served = 0
      while (!mutator.isCompleted || served == 0) {
        val r = pairs(EpochNearDup.serve(spark, path, probes))
        served += 1
        assert(r == r0 || r == r1,
          s"mixed-generation near-dup read: $r")
      }
      Await.result(mutator, 120.seconds)
    } finally pool.shutdownNow()
    assert(pairs(EpochNearDup.serve(spark, path, probes)) === r1)
    // snapshot isolation: the pre-mutation manifest still serves r0
    assert(pairs(EpochNearDup.servedOn(spark, path, m0, probes)) === r0)
  }

  test("delete hides matches immediately and compact drops them " +
      "physically; replays are ledger no-ops; re-add gate holds") {
    val path = s"${graft.GraftSession.scratchDir}/nde_del"
    build(path, oldDocs ++ newDocs)
    EpochNearDup.delete(spark,
      Seq.range(101L, 121L).toDF("doc_id"), path, batchId = 2L)
    val afterDel = pairs(EpochNearDup.serve(spark, path, probes))
    assert(afterDel === (1L to 20L).toSet)
    val epochs = Epoch.committedList(spark, path)
    // replayed delete: same key, nothing commits
    EpochNearDup.delete(spark,
      Seq.range(101L, 121L).toDF("doc_id"), path, batchId = 2L)
    assert(Epoch.committedList(spark, path) === epochs)
    // replayed append: batch 0 is in the ledger (the builder's append),
    // so the replay short-circuits BEFORE the re-add gate — ledger
    // check precedes the gate, which is what makes replay a no-op even
    // after its docs were tombstoned
    EpochNearDup.append(spark, newDocs.toDF("doc_id", "text"), path,
      batchId = 0L)
    assert(Epoch.committedList(spark, path) === epochs)
    // re-adding a tombstoned id under a NEW batch id is refused
    val e = intercept[IllegalArgumentException] {
      EpochNearDup.append(spark, newDocs.toDF("doc_id", "text"), path,
        batchId = 9L)
    }
    assert(e.getMessage.contains("re-adds tombstoned"))
    EpochNearDup.compact(spark, path)
    assert(pairs(EpochNearDup.serve(spark, path, probes)) ===
      (1L to 20L).toSet)
    // compact folded the tombstones: the ids are appendable again
    EpochNearDup.append(spark, newDocs.toDF("doc_id", "text"), path,
      batchId = 10L)
    assert(pairs(EpochNearDup.serve(spark, path, probes)) ===
      ((1L to 20L) ++ (101L to 120L)).toSet)
  }

  private def build(path: String, docs: Seq[(Long, String)]): Unit = {
    val half = docs.filter(_._1 % 2 == 0)
    val rest = docs.filter(_._1 % 2 == 1)
    EpochNearDup.build(spark, half.toDF("doc_id", "text"), path)
    EpochNearDup.append(spark, rest.toDF("doc_id", "text"), path,
      batchId = 0L)
  }
}
