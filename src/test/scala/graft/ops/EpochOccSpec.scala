package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Multi-writer OCC pins ([[Epoch.occ]] — the claim/rebase commit
  * protocol that retires the single-mutator contract): racing appends
  * both land with no lost update; the loser's retry rebases onto the
  * winner's epoch; a held claim blocks (bounded, loud) and an orphaned
  * claim is breakable; prune retires spent claims; replayed batch ids
  * stay ledger-no-ops through the occ face. */
class EpochOccSpec extends SparkTestBase {

  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) =
    ids.map(i => (i, s"spark merge filter d$i word$i"))
      .toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      math.round(r.getDouble(3) * 1e9))).toSeq

  private val terms = Seq("spark", "merge", "filter")

  test("two concurrent occ appends: no lost update — both batches land, " +
      "result equals the sequential twin, both ledger keys present") {
    val path = s"${graft.GraftSession.scratchDir}/occ_race"
    EpochPostings.build(spark, mkDocs(1L to 20L), path)
    // sequential twin = the answer BOTH interleavings must produce
    // (disjoint appends commute: segment union + algebraic df/stats)
    val twin = s"${graft.GraftSession.scratchDir}/occ_race_twin"
    EpochPostings.build(spark, mkDocs(1L to 20L), twin)
    EpochPostings.append(spark, mkDocs(21L to 40L), twin, batchId = 1L)
    EpochPostings.append(spark, mkDocs(41L to 60L), twin, batchId = 2L)
    val want = rows(EpochPostings.serve(spark, twin, terms))

    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val gate = new CountDownLatch(2) // maximize claim contention
    try {
      val fs = Seq((21L to 40L, 1L), (41L to 60L, 2L)).map {
        case (ids, b) =>
          Future {
            gate.countDown(); gate.await(30, TimeUnit.SECONDS)
            Epoch.occ(spark, path) {
              EpochPostings.append(spark, mkDocs(ids), path, batchId = b)
            }
          }
      }
      Await.result(Future.sequence(fs), 180.seconds)
    } finally pool.shutdownNow()

    assert(rows(EpochPostings.serve(spark, path, terms)) === want)
    val m = Epoch.resolve(spark, path).get
    assert(m.epoch === 2L, "both writers must have committed an epoch")
    assert(m.has("app_1") && m.has("app_2"),
      "the rebased loser's ledger key must survive alongside the winner's")
  }

  test("a held claim blocks a competing occ writer loudly at the " +
      "deadline; breakClaim unblocks; prune retires spent claims") {
    val path = s"${graft.GraftSession.scratchDir}/occ_claim"
    EpochPostings.build(spark, mkDocs(1L to 10L), path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fsys = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer that died between claim and commit
    assert(fsys.createNewFile(new org.apache.hadoop.fs.Path(path, "_claim_1")))
    val e = intercept[IllegalStateException] {
      Epoch.occ(spark, path, maxWaitMs = 300L) {
        EpochPostings.append(spark, mkDocs(11L to 20L), path, batchId = 9L)
      }
    }
    assert(e.getMessage.contains("claimed by another writer"))
    assert(Epoch.resolve(spark, path).get.epoch === 0L,
      "the blocked mutation must not have half-committed")
    // breaking a COMMITTED epoch's claim is refused; the orphan is not
    intercept[IllegalArgumentException] {
      Epoch.breakClaim(spark, path, 0L)
    }
    Epoch.breakClaim(spark, path, 1L)
    Epoch.occ(spark, path) {
      EpochPostings.append(spark, mkDocs(11L to 20L), path, batchId = 9L)
    }
    assert(Epoch.resolve(spark, path).get.epoch === 1L)
    // a spent claim at/below the committed head is pruned; the twin
    // layout check: plant one and prune
    assert(fsys.createNewFile(new org.apache.hadoop.fs.Path(path, "_claim_0")))
    Epoch.prune(spark, path, keep = 2)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(path, "_claim_0")))
  }

  test("occ no-op mutations release their claim (replayed batch id, " +
      "empty batch) and commit nothing") {
    val path = s"${graft.GraftSession.scratchDir}/occ_noop"
    EpochPostings.build(spark, mkDocs(1L to 10L), path)
    Epoch.occ(spark, path) {
      EpochPostings.append(spark, mkDocs(11L to 20L), path, batchId = 1L)
    }
    val before = rows(EpochPostings.serve(spark, path, terms))
    // replayed key: ledger no-op under occ — and the claim it took for
    // epoch 2 must be released so the NEXT writer can proceed
    Epoch.occ(spark, path) {
      EpochPostings.append(spark, mkDocs(11L to 20L), path, batchId = 1L)
    }
    Epoch.occ(spark, path) {
      EpochPostings.append(spark, mkDocs(Seq.empty[Long]), path,
        batchId = 2L)
    }
    assert(Epoch.resolve(spark, path).get.epoch === 1L,
      "no-op occ blocks must not burn epoch numbers")
    Epoch.occ(spark, path) {
      EpochPostings.append(spark, mkDocs(21L to 30L), path, batchId = 3L)
    }
    assert(Epoch.resolve(spark, path).get.epoch === 2L)
    assert(before !== rows(EpochPostings.serve(spark, path, terms)))
  }
}
