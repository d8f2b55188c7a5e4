package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cross-tier snapshot pins ([[Snapshot]] — one registry manifest
  * pinning an epoch per tier): a composed reader sees all-old or
  * all-new ACROSS tiers, never a straddled ingest; the crash window
  * between tier appends and the registry flip leaves readers on the
  * old consistent pair and the replayed ingest completes it
  * exactly-once; pruned tier pins fail loudly. */
class SnapshotSpec extends SparkTestBase {

  import spark.implicits._

  private def mkDocs(ids: Seq[Long]) =
    ids.map(i => (i, s"spark merge filter d$i word$i"))
      .toDF("doc_id", "text")

  private def mkVecs(ids: Seq[Long]) =
    ids.map(i => (i, Array((i % 7).toFloat, (i % 3).toFloat,
      1.0f, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")

  // the doc ids the pinned postings epoch actually references — the
  // raw consistency probe (serving caps at top-10, which would mask
  // half-visible ingests on larger fixtures)
  private def kwDocs(post: String,
      pins: Map[String, Long]): Set[Long] =
    Epoch.read(spark, post,
      Snapshot.pinned(spark, post, pins, "postings"), "lists").get
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet

  private def vecIds(ivf: String, pins: Map[String, Long]): Set[Long] =
    EpochAnn.loadOn(spark, ivf, Snapshot.pinned(spark, ivf, pins, "ivf"))
      .assigned.select("vec_id").collect().map(_.getLong(0)).toSet

  test("a reader's resolved pins survive a later snapshot; the crash " +
      "window shows the OLD consistent pair; replayed ingest completes " +
      "the flip exactly-once") {
    val tag = s"${graft.GraftSession.scratchDir}/snap_spec"
    val (reg, post, ivf) = (s"$tag/reg", s"$tag/post", s"$tag/ivf")
    EpochPostings.build(spark, mkDocs(1L to 8L), post)
    EpochAnn.build(spark, mkVecs(1L to 8L), ivf, k = 2)
    Snapshot.publish(spark, reg, Map("postings" -> 0L, "ivf" -> 0L),
      "ing_0")
    val pins0 = Snapshot.resolvePins(spark, reg)

    // CRASH WINDOW: both tiers append batch 1 but the registry flip
    // never happens — a composed reader resolving NOW still gets the
    // old pair, and BOTH tiers serve pre-ingest state through it
    EpochPostings.append(spark, mkDocs(9L to 16L), post, batchId = 1L)
    EpochAnn.append(spark, mkVecs(9L to 16L), ivf, batchId = 1L)
    val pinsCrash = Snapshot.resolvePins(spark, reg)
    assert(pinsCrash === Map("postings" -> 0L, "ivf" -> 0L))
    assert(kwDocs(post, pinsCrash) === (1L to 8L).toSet)
    assert(vecIds(ivf, pinsCrash) === (1L to 8L).toSet)

    // REPLAYED ingest: the tier legs no-op through their ledgers (no
    // double-append) and the registry flip completes
    Snapshot.ingestBoth(spark, reg, post, ivf, mkDocs(9L to 16L),
      mkVecs(9L to 16L), batchId = 1L)
    val pins1 = Snapshot.resolvePins(spark, reg)
    assert(pins1 === Map("postings" -> 1L, "ivf" -> 1L))
    assert(kwDocs(post, pins1) === (1L to 16L).toSet)
    assert(vecIds(ivf, pins1) === (1L to 16L).toSet)
    assert(Epoch.resolve(spark, post).get.epoch === 1L,
      "replayed tier append must not have produced a second epoch")

    // SNAPSHOT ISOLATION ACROSS TIERS: the reader that resolved pins0
    // before everything still sees the pre-ingest pair on both tiers
    assert(kwDocs(post, pins0) === (1L to 8L).toSet)
    assert(vecIds(ivf, pins0) === (1L to 8L).toSet)

    // replayed registry publish alone is also a no-op
    Snapshot.publish(spark, reg,
      Map("postings" -> 99L, "ivf" -> 99L), "ing_1")
    assert(Snapshot.resolvePins(spark, reg) === pins1)
  }

  test("a pin whose tier epoch was pruned fails loudly naming the " +
      "retention contract; unknown tier fails loudly") {
    val tag = s"${graft.GraftSession.scratchDir}/snap_spec_prune"
    val (reg, post) = (s"$tag/reg", s"$tag/post")
    EpochPostings.build(spark, mkDocs(1L to 8L), post)
    Snapshot.publish(spark, reg, Map("postings" -> 0L), "ing_0")
    EpochPostings.append(spark, mkDocs(9L to 12L), post, batchId = 1L)
    EpochPostings.compact(spark, post)
    Epoch.prune(spark, post, keep = 1) // retires epochs 0 and 1
    val pins = Snapshot.resolvePins(spark, reg)
    val e = intercept[IllegalStateException] {
      Snapshot.pinned(spark, post, pins, "postings")
    }
    assert(e.getMessage.contains("prune horizon"))
    intercept[IllegalStateException] {
      Snapshot.pinned(spark, post, pins, "nosuch")
    }
  }
}
