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

  test("a sub-shingle probe (one token) matches nothing, crashes nothing") {
    import spark.implicits._
    val path = NearDup.savedFullPath(spark, sf)
    val probes = Seq((999999L, "solitary")).toDF("doc_id", "text")
    assert(NearDup.serveNearDup(spark, probes, path).count() === 0L)
  }
}
