package graft.ops

import org.apache.spark.sql.SparkSession

/** Cross-tier CONSISTENT snapshots — a registry manifest pinning one
  * committed epoch per serving tier, so a composed query (hybrid
  * retrieval = postings tier × vector tier) reads ONE corpus view.
  *
  * The seam this closes: each epoch layout ([[Epoch]]) is snapshot-
  * isolated on its own, but a composition that resolves two layouts'
  * manifests INDEPENDENTLY can straddle an ingest — a batch landed in
  * the postings tier but not yet in the IVF tier is visible to the
  * keyword list and missing from the vector list (the reference never
  * faces this: its full reload cuts every table over together,
  * `updatecalaccessrawdata.py:~100-200`). The registry is the epoch
  * mechanism applied to ITSELF: one more manifest layout whose
  * "components" are not data directories but `tier → pinned epoch
  * number`, flipped by the same atomic numbered-manifest rename. A
  * reader resolves the registry ONCE and then opens every tier with
  * [[Epoch.resolveAsOf]] at its pinned epoch — all-old or all-new
  * across tiers, never mixed.
  *
  * Ingest protocol ([[ingestBoth]]): append to each tier under the
  * SHARED batch id (each tier's own ledger makes its leg replay-safe),
  * then publish one registry epoch pinning the tiers' new heads under
  * `ing_<batchId>`. A crash between the tier appends and the registry
  * publish leaves the tiers advanced but UNPUBLISHED — registry
  * readers keep the old consistent pair (both tiers at their old
  * epochs), and the replayed ingest no-ops through the tier ledgers
  * and completes the publish. Exactly-once AND atomic visibility,
  * from two layers of the same ledger discipline.
  *
  * Retention: tier prunes must keep every epoch a retained registry
  * snapshot pins (size each tier's `keep` ≥ the registry's) — the
  * same horizon contract as a single layout's pinned readers. */
object Snapshot {

  /** Publish registry epoch pinning `pins` (tier name → committed
    * epoch of that tier), replay-safe on `key` through the registry
    * manifest's applied ledger. */
  def publish(s: SparkSession, regPath: String, pins: Map[String, Long],
      key: String): Unit = {
    val cur = Epoch.resolve(s, regPath)
    if (cur.exists(_.has(key))) return
    Epoch.commit(s, regPath, Epoch.Manifest(
      cur.map(_.next).getOrElse(0L),
      pins.map { case (t, e) => t -> Seq(e.toString) },
      cur.map(_.applied).getOrElse(Seq.empty) :+ key))
  }

  /** Resolve the registry's CURRENT pins once — the composed query's
    * single coordination point. */
  def resolvePins(s: SparkSession, regPath: String): Map[String, Long] =
    Epoch.resolve(s, regPath).getOrElse(throw new IllegalStateException(
      s"Snapshot: no published snapshot at $regPath"))
      .components.map { case (t, v) =>
        require(v.size == 1, s"Snapshot: tier $t pins ${v.size} epochs")
        t -> v.head.toLong
      }

  /** Open tier `tier` (an epoch layout at `tierPath`) AS OF the pinned
    * epoch in `pins` — fails loudly if the pinned epoch was pruned
    * away (the retention contract above was violated). */
  def pinned(s: SparkSession, tierPath: String, pins: Map[String, Long],
      tier: String): Epoch.Manifest = {
    val e = pins.getOrElse(tier, throw new IllegalStateException(
      s"Snapshot: tier $tier not pinned"))
    Epoch.resolveAsOf(s, tierPath, e).getOrElse(
      throw new IllegalStateException(
        s"Snapshot: tier $tier pinned at epoch $e but that epoch is " +
          s"gone from $tierPath — tier prune horizon must cover every " +
          "retained snapshot's pin"))
  }

  /** Retention coordination — the ENFORCED form of the horizon
    * contract [[pinned]] documents: prune the registry to its own
    * `regKeep` newest snapshots, then prune each tier keeping the
    * larger of the tier's own `tierKeep` horizon and EVERY epoch a
    * retained snapshot still pins (prune keeps the newest K manifests,
    * so covering the oldest retained pin means keeping
    * `head − oldestPin + 1` epochs). After this, no retained snapshot
    * can dangle — [[pinned]]'s loud failure becomes unreachable for
    * registry-resolved readers, and tier history is bounded by the
    * registry's retention instead of by hand-sized per-tier knobs. */
  def pruneAll(s: SparkSession, regPath: String,
      tierPaths: Map[String, String], regKeep: Int = 3,
      tierKeep: Int = 1): Unit = {
    Epoch.prune(s, regPath, regKeep)
    val retainedPins: Map[String, Seq[Long]] =
      Epoch.committedList(s, regPath)
        .flatMap(n => Epoch.resolveAsOf(s, regPath, n))
        .flatMap(_.components.toSeq.map { case (t, v) =>
          t -> v.head.toLong
        })
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    tierPaths.foreach { case (tier, path) =>
      val head = Epoch.resolve(s, path).map(_.epoch).getOrElse(0L)
      val needed = retainedPins.get(tier) match {
        case Some(pins) => (head - pins.min + 1).toInt.max(tierKeep)
        case None => tierKeep
      }
      Epoch.prune(s, path, needed)
    }
  }

  /** One ingest batch across BOTH retrieval tiers + the registry
    * flip: docs append to the postings layout, vectors to the IVF
    * layout (shared `batchId`; each leg tier-ledger replay-safe), then
    * the registry pins the two new heads as one snapshot. Until that
    * last rename lands, composed readers see the PREVIOUS pair. */
  def ingestBoth(s: SparkSession, regPath: String, postingsPath: String,
      ivfPath: String, docs: org.apache.spark.sql.DataFrame,
      vectors: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
    EpochPostings.append(s, docs, postingsPath, batchId)
    EpochAnn.append(s, vectors, ivfPath, batchId)
    publish(s, regPath, Map(
      "postings" -> Epoch.resolve(s, postingsPath).get.epoch,
      "ivf" -> Epoch.resolve(s, ivfPath).get.epoch),
      s"ing_$batchId")
  }
}
