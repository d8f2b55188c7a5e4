package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted near-dup index pins: the lifecycle identities the registry
  * entries hash-verify (append ≡ rebuild, compact ≡ no semantic change),
  * the plan shape the layout exists for (pushed band-key lookup), the
  * physical effect of compaction (tombstoned rows gone, segment dropped),
  * and the mutation-discipline edges shared with the other layouts
  * (empty/no-op batches, the tombstone re-add gate). */
class NearDupSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def serveOff(path: String) =
    NearDup.serveNearDup(spark,
      graft.Tables.documents(spark, sf).where(col("doc_id") % 62 === 8),
      path)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("match_id"),
        r.getAs[Double]("jaccard")))
      .sortBy(p => (p._1, p._2)).toSeq

  test("band-key lookup is a pushed In filter on the bucket directory") {
    val path = NearDup.savedFullPath(spark, sf)
    val plan = spark.read.parquet(s"$path/bands")
      .where(col("band_key").isin("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(band_key"),
      plan)
  }

  test("append ≡ rebuild: half-built + half-appended serves identically") {
    assert(serveOff(NearDup.savedAppendPath(spark, sf)) ===
      serveOff(NearDup.savedFullPath(spark, sf)))
  }

  test("compact drops tombstoned rows physically and the segment itself") {
    val docs = graft.Tables.documents(spark, sf)
    val path = s"${graft.GraftSession.scratchDir}/neardup_spec_cpt"
    NearDup.buildNearDup(spark, docs, path)
    NearDup.neardupDelete(spark,
      docs.where(col("doc_id") % 5 === 0).select("doc_id"), path)
    val served = serveOff(path)
    val bandsBefore = spark.read.parquet(s"$path/bands").count()
    NearDup.neardupCompact(spark, path)
    // segment gone, rows physically dropped, served output unchanged
    assert(!Layout.dirExists(spark, s"$path/tombstones"))
    val bands = spark.read.parquet(s"$path/bands")
    assert(bands.count() < bandsBefore)
    assert(bands.where(col("doc_id") % 5 === 0).count() === 0L)
    assert(spark.read.parquet(s"$path/toks")
      .where(col("doc_id") % 5 === 0).count() === 0L)
    assert(serveOff(path) === served)
  }

  test("an over-ceiling probe batch fails BEFORE driver materialization") {
    // > MaxProbes docs with >= 2 tokens each → > MaxProbes*4 band rows.
    // The serve plan bounds its band collect with limit(ceiling + 1), so
    // the require trips after at most ONE row past the ceiling reaches
    // the driver — an oversized batch can fail the guard but can never
    // OOM the driver first (the r20-verdict safety property).
    val path = NearDup.savedFullPath(spark, sf)
    val oversized = spark.range(NearDup.MaxProbes + 1L)
      .select(col("id").as("doc_id"),
        concat(lit("tok"), col("id"), lit(" alpha beta")).as("text"))
    val e = intercept[IllegalArgumentException] {
      NearDup.serveNearDup(spark, oversized, path).collect()
    }
    assert(e.getMessage.contains("band rows"), e.getMessage)
    assert(e.getMessage.contains("split the batch"), e.getMessage)
  }

  test("empty and re-delivered delete batches are no-ops") {
    val docs = graft.Tables.documents(spark, sf)
    val path = s"${graft.GraftSession.scratchDir}/neardup_spec_del"
    NearDup.buildNearDup(spark, docs, path)
    import spark.implicits._
    NearDup.neardupDelete(spark, Seq.empty[Long].toDF("doc_id"), path)
    assert(!Layout.dirExists(spark, s"$path/tombstones"))
    NearDup.neardupDelete(spark, Seq(4L, 8L).toDF("doc_id"), path)
    val n1 = spark.read.parquet(s"$path/tombstones").count()
    // same batch again: fresh-id exclusion makes it a no-op by
    // construction (the streaming takedown exactly-once contract)
    NearDup.neardupDelete(spark, Seq(4L, 8L).toDF("doc_id"), path)
    assert(spark.read.parquet(s"$path/tombstones").count() === n1)
  }

  test("re-adding a tombstoned id is refused until compact") {
    val docs = graft.Tables.documents(spark, sf)
    val path = s"${graft.GraftSession.scratchDir}/neardup_spec_gate"
    NearDup.buildNearDup(spark, docs.where(col("doc_id") =!= 4), path)
    NearDup.neardupDelete(spark,
      docs.where(col("doc_id") === 6).select("doc_id"), path)
    val ex = intercept[IllegalArgumentException] {
      NearDup.neardupAppend(spark, docs.where(col("doc_id") === 6), path)
    }
    assert(ex.getMessage.contains("tombstoned"))
    NearDup.neardupCompact(spark, path)
    NearDup.neardupAppend(spark, docs.where(col("doc_id") === 6), path)
    assert(spark.read.parquet(s"$path/toks")
      .where(col("doc_id") === 6).count() === 1L)
  }

  test("ingest stream: gate, self-growth, and replay-as-no-op") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val path = s"${graft.GraftSession.scratchDir}/neardup_spec_ingest"
    // controlled corpus: doc 1's text has a known near-copy incoming
    NearDup.buildNearDup(spark, Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")).toDF("doc_id", "text"), path)
    val source = MemoryStream[(Long, String)]
    val verdicts = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    val q = graft.streaming.StreamRunner.neardupIngestStream(path,
      source.toDF().toDF("doc_id", "text")) { out =>
      verdicts.synchronized {
        verdicts ++= out.collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("verdict"), r.getAs[Long]("n_matches")))
      }
    }
    // batch 1: a near-copy of corpus doc 1 (reject) + a fresh doc
    // (accept → indexed)
    source.addData(
      101L -> "a b c d e f g h i z",
      102L -> "u v w x y z aa bb cc dd")
    q.processAllAvailable()
    // batch 2: a near-copy of the doc batch 1 just ACCEPTED — the gate
    // must reject it, proving the index grew mid-stream
    source.addData(201L -> "u v w x y z aa bb cc ee")
    q.processAllAvailable()
    q.stop()
    assert(verdicts.sortBy(_._1).toSeq === Seq(
      (101L, "reject", 1L), (102L, "accept", 0L),
      (201L, "reject", 1L)))
    val indexed = spark.read.parquet(s"$path/toks")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed === Set(1L, 2L, 102L))
    // replay batch 1 (same content, as after a crash): identical
    // verdicts — 102 now self-matches nothing (id-excluded) — and the
    // index is untouched
    val replay = NearDup.ingestBatch(spark, Seq(
      (101L, "a b c d e f g h i z"),
      (102L, "u v w x y z aa bb cc dd")).toDF("doc_id", "text"), path)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("verdict"))).sortBy(_._1).toSeq
    assert(replay === Seq(101L -> "reject", 102L -> "accept"))
    assert(spark.read.parquet(s"$path/toks").count() === 3L)
  }

  test("intra-batch near-dup pair: both accepted, and a crash-replayed " +
      "batch re-derives the SAME verdicts (not mutual rejects)") {
    import spark.implicits._
    val path = s"${graft.GraftSession.scratchDir}/neardup_spec_intrabatch"
    NearDup.buildNearDup(spark, Seq(
      (1L, "a b c d e f g h i j")).toDF("doc_id", "text"), path)
    // 301 and 302 are near-dups OF EACH OTHER but of nothing indexed
    val batch = Seq(
      (301L, "p q r s t u v w x y"),
      (302L, "p q r s t u v w x z")).toDF("doc_id", "text")
    def run() = NearDup.ingestBatch(spark, batch, path)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("verdict"), r.getAs[Long]("n_matches")))
      .sortBy(_._1).toSeq
    val first = run()
    // the gate checks the INDEX: intra-batch pairs are both accepted
    assert(first === Seq((301L, "accept", 0L), (302L, "accept", 0L)))
    assert(spark.read.parquet(s"$path/toks").count() === 3L)
    // replay after the append: each pair member is now indexed, but the
    // batch-own-id exclusion keeps the verdicts identical — and the
    // index is untouched
    assert(run() === first)
    assert(spark.read.parquet(s"$path/toks").count() === 3L)
    // a LATER batch (different ids, similar text) is gated normally:
    // the exclusion is batch-scoped, not a blanket blind spot
    val later = NearDup.ingestBatch(spark,
      Seq((401L, "p q r s t u v w x w")).toDF("doc_id", "text"), path)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("verdict"))).toSeq
    assert(later === Seq(401L -> "reject"))
  }

  test("a sub-shingle probe (one token) matches nothing, crashes nothing") {
    import spark.implicits._
    val path = NearDup.savedFullPath(spark, sf)
    val probes = Seq((999999L, "solitary")).toDF("doc_id", "text")
    assert(NearDup.serveNearDup(spark, probes, path).count() === 0L)
  }
}
