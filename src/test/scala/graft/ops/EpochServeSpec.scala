package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Epoch-layout pins (round-15 verdict "next" #1 — snapshot-isolated
  * serving): a reader overlapping ANY mutation sees a wholly-old or
  * wholly-new epoch, never a mixed one; a pinned manifest keeps
  * serving its snapshot after later commits; replayed batches are
  * ledger-no-ops; prune retires exactly the unreferenced history. */
class EpochServeSpec extends SparkTestBase {

  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) =
    ids.map(i => (i, s"spark merge filter d$i word$i"))
      .toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      math.round(r.getDouble(3) * 1e9))).toSeq

  test("a reader racing append+compact sees wholly-old or wholly-new, " +
      "never mixed; a pinned manifest survives later commits") {
    val path = s"${graft.GraftSession.scratchDir}/epoch_race"
    val terms = Seq("spark", "merge", "filter")
    EpochPostings.build(spark, mkDocs(1L to 40L), path)
    val m0 = Epoch.resolve(spark, path).get
    val r0 = rows(EpochPostings.serve(spark, path, terms))
    // the post-append expected state, computed on a TWIN layout so the
    // race target stays untouched until the background thread mutates
    val twin = s"${graft.GraftSession.scratchDir}/epoch_race_twin"
    EpochPostings.build(spark, mkDocs(1L to 40L), twin)
    EpochPostings.append(spark, mkDocs(41L to 80L), twin, batchId = 1L)
    val r1 = rows(EpochPostings.serve(spark, twin, terms))
    assert(r0 !== r1, "append must visibly change the served ranking")

    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val mutator = Future {
        EpochPostings.append(spark, mkDocs(41L to 80L), path, batchId = 1L)
        EpochPostings.compact(spark, path)
      }
      // serve continuously while the mutation runs: every answer must
      // be EXACTLY the old state or EXACTLY the new one — a mixed read
      // (appended lists with old stats, or old df with new lists)
      // produces a third ranking and fails here
      var sawOld, sawNew = false
      var served = 0
      while (!mutator.isCompleted || served == 0) {
        val r = rows(EpochPostings.serve(spark, path, terms))
        served += 1
        assert(r == r0 || r == r1,
          s"mixed-generation read: $r is neither the pre-append nor " +
            "the post-append answer")
        if (r == r0) sawOld = true
        if (r == r1) sawNew = true
      }
      Await.result(mutator, 120.seconds)
      assert(rows(EpochPostings.serve(spark, path, terms)) === r1)
      assert(sawOld || sawNew) // the loop really served during the race
      // SNAPSHOT ISOLATION: the manifest pinned BEFORE the mutations
      // still serves the original answer — append (epoch 1) and
      // compact (epoch 2) never touched epoch 0's directories
      assert(rows(EpochPostings.servedOn(spark, path, m0, terms)) === r0)
    } finally pool.shutdownNow()
  }

  test("append/delete replay on the same batch key is a ledger no-op; " +
      "delete+compact equal a survivors rebuild; pushed term filter " +
      "survives the multi-dir scan") {
    val path = s"${graft.GraftSession.scratchDir}/epoch_once"
    val terms = Seq("spark", "merge", "filter")
    EpochPostings.build(spark, mkDocs(1L to 20L), path)
    EpochPostings.append(spark, mkDocs(21L to 40L), path, batchId = 7L)
    val afterApp = Epoch.resolve(spark, path).get
    EpochPostings.append(spark, mkDocs(21L to 40L), path, batchId = 7L)
    assert(Epoch.resolve(spark, path).get.epoch === afterApp.epoch,
      "replayed append committed a second epoch")
    val r1 = rows(EpochPostings.serve(spark, path, terms))

    EpochPostings.delete(spark, Seq(3L, 25L).toDF("doc_id"), path,
      batchId = 8L)
    val afterDel = Epoch.resolve(spark, path).get
    EpochPostings.delete(spark, Seq(3L, 25L).toDF("doc_id"), path,
      batchId = 8L)
    assert(Epoch.resolve(spark, path).get.epoch === afterDel.epoch)
    val served = rows(EpochPostings.serve(spark, path, terms))
    // survivors rebuild on a twin layout must match the tombstoned one
    val twin = s"${graft.GraftSession.scratchDir}/epoch_once_twin"
    EpochPostings.build(spark,
      mkDocs((1L to 40L).filterNot(Set(3L, 25L))), twin)
    assert(served === rows(EpochPostings.serve(spark, twin, terms)))
    assert(served !== r1)
    // compaction folds the tombstones physically; the answer holds
    EpochPostings.compact(spark, path)
    assert(rows(EpochPostings.serve(spark, path, terms)) === served)
    assert(Epoch.resolve(spark, path).get
      .components("tombstones").isEmpty)
    // re-adding a tombstoned id without compacting is refused by name
    val path2 = s"${graft.GraftSession.scratchDir}/epoch_gate"
    EpochPostings.build(spark, mkDocs(1L to 4L), path2)
    EpochPostings.delete(spark, Seq(2L).toDF("doc_id"), path2, 1L)
    val ex = intercept[IllegalArgumentException] {
      EpochPostings.append(spark, mkDocs(Seq(2L)), path2, 2L)
    }
    assert(ex.getMessage.contains("compact first"), ex.getMessage)
    // plan shape: the term restriction reaches the parquet scan of the
    // multi-dir lists component (one relation over the segment dirs)
    val m2 = Epoch.resolve(spark, path).get
    val plan = Epoch.read(spark, path, m2, "lists").get
      .where(col("term").isin("spark", "merge", "filter"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      plan)
  }

  test("streaming ingest appends epochs exactly-once off the " +
      "checkpointed batch id; serving between batches equals a " +
      "rebuild over the drained corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = s"${graft.GraftSession.scratchDir}/epoch_stream"
    val terms = Seq("spark", "merge", "filter")
    EpochPostings.build(spark, mkDocs(1L to 10L), path)
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamRunner.postingsIngestEpochStream(
      path, source.toDF().toDF("doc_id", "text"))
    source.addData((11L to 20L).map(i =>
      i -> s"spark merge filter d$i word$i"): _*)
    q.processAllAvailable()
    val afterB0 = Epoch.resolve(spark, path).get
    assert(afterB0.has("app_0"))
    source.addData((21L to 30L).map(i =>
      i -> s"spark merge filter d$i word$i"): _*)
    q.processAllAvailable()
    q.stop()
    assert(Epoch.resolve(spark, path).get.has("app_1"))
    // crash-replay of batch 0's payload under its id: ledger no-op
    EpochPostings.append(spark, mkDocs(11L to 20L), path, batchId = 0L)
    assert(Epoch.resolve(spark, path).get.epoch
      === afterB0.epoch + 1)
    // drained state ≡ one-shot rebuild
    val twin = s"${graft.GraftSession.scratchDir}/epoch_stream_twin"
    EpochPostings.build(spark, mkDocs(1L to 30L), twin)
    assert(rows(EpochPostings.serve(spark, path, terms))
      === rows(EpochPostings.serve(spark, twin, terms)))
  }

  test("the positional epoch layout: delta appends serve new phrase " +
      "hits, deletes hide them behind the manifest while pinned " +
      "readers keep them, compact ≡ survivors") {
    import spark.implicits._
    val path = s"${graft.GraftSession.scratchDir}/epoch_pos"
    val mk = (ids: Seq[Long]) =>
      ids.map(i => (i, s"spark merge d$i")).toDF("doc_id", "text")
    EpochPositional.build(spark, mk(Seq(1L, 2L)), path)
    def hits(m: Option[Epoch.Manifest] = None): Set[Long] =
      (m match {
        case Some(man) => EpochPositional.servePhraseOn(spark, path,
          man, Seq("spark", "merge"))
        case None => EpochPositional.servePhrase(spark, path,
          Seq("spark", "merge"))
      }).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits() === Set(1L, 2L))
    EpochPositional.append(spark, mk(Seq(3L)), path, batchId = 1L)
    assert(hits() === Set(1L, 2L, 3L))
    val e1 = Epoch.resolve(spark, path).get
    EpochPositional.append(spark, mk(Seq(3L)), path, batchId = 1L)
    assert(Epoch.resolve(spark, path).get.epoch === e1.epoch)
    EpochPositional.delete(spark, Seq(2L).toDF("doc_id"), path,
      batchId = 2L)
    assert(hits() === Set(1L, 3L))
    // the manifest pinned before the delete still serves doc 2
    assert(hits(Some(e1)) === Set(1L, 2L, 3L))
    EpochPositional.compact(spark, path)
    assert(hits() === Set(1L, 3L))
    assert(Epoch.resolve(spark, path).get
      .components("tombstones").isEmpty)
    // compacted stats equal a survivors rebuild's
    val twin = s"${graft.GraftSession.scratchDir}/epoch_pos_twin"
    EpochPositional.build(spark, mk(Seq(1L, 3L)), twin)
    def stats(p: String) = {
      val m = Epoch.resolve(spark, p).get
      Epoch.read(spark, p, m, "stats").get.collect().head.toSeq
    }
    assert(stats(path) === stats(twin))
  }

  test("as-of reads serve history exactly: epoch 0 still answers with " +
      "pre-delete content after the delete commits, and pruned history " +
      "resolves to None") {
    val path = s"${graft.GraftSession.scratchDir}/epoch_asof"
    val terms = Seq("spark", "merge", "filter")
    EpochPostings.build(spark, mkDocs(1L to 10L), path)          // e0
    val full = rows(EpochPostings.serve(spark, path, terms))
    EpochPostings.delete(spark,
      Seq(2L, 4L).toDF("doc_id"), path, batchId = 1L)            // e1
    // current epoch serves survivors; epoch 0 serves the full corpus
    assert(rows(EpochPostings.serve(spark, path, terms)) !== full)
    val m0 = Epoch.resolveAsOf(spark, path, 0L).get
    assert(rows(EpochPostings.servedOn(spark, path, m0, terms))
      === full)
    // a never-committed epoch resolves to None
    assert(Epoch.resolveAsOf(spark, path, 7L).isEmpty)
    // pruning retires history: epoch 0 gone, as-of read refuses
    EpochPostings.compact(spark, path)                           // e2
    Epoch.prune(spark, path, keep = 1)
    assert(Epoch.resolveAsOf(spark, path, 0L).isEmpty)
  }

  test("prune keeps the newest manifests and every generation they " +
      "reference; a crash before commit leaves orphans that replay " +
      "cleans up") {
    val path = s"${graft.GraftSession.scratchDir}/epoch_prune"
    EpochPostings.build(spark, mkDocs(1L to 10L), path)          // e0
    EpochPostings.append(spark, mkDocs(11L to 20L), path, 1L)    // e1
    EpochPostings.compact(spark, path)                           // e2
    val terms = Seq("spark", "merge", "filter")
    val r = rows(EpochPostings.serve(spark, path, terms))
    Epoch.prune(spark, path, keep = 1)
    val left = new java.io.File(path).list().toSet
    assert(left.filter(_.startsWith("_manifest")) === Set("_manifest_2"))
    // epoch 2 (compact) references only g2 — g0/g1 retired
    assert(!left.contains("g0") && !left.contains("g1") &&
      left.contains("g2"), left.toString)
    assert(rows(EpochPostings.serve(spark, path, terms)) === r)
    // crash simulation: a mutation writes its generation dirs but dies
    // before the manifest rename — readers never see it, and the
    // replayed batch rebuilds the generation and commits normally
    val g3 = new java.io.File(s"$path/g3"); g3.mkdirs()
    new java.io.File(g3, "delta").mkdirs()
    assert(Epoch.resolve(spark, path).get.epoch === 2L)
    assert(rows(EpochPostings.serve(spark, path, terms)) === r)
    EpochPostings.append(spark, mkDocs(21L to 30L), path, 2L)    // e3
    assert(Epoch.resolve(spark, path).get.epoch === 3L)
    assert(rows(EpochPostings.serve(spark, path, terms)) !== r)
    // committing an epoch twice is refused (single-mutator contract)
    val m = Epoch.resolve(spark, path).get
    val ex = intercept[IllegalArgumentException] {
      Epoch.commit(spark, path, m)
    }
    assert(ex.getMessage.contains("already committed"), ex.getMessage)
  }
}
