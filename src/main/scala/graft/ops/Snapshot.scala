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
    * manifest's applied ledger. The commit runs under [[Epoch.occ]] on
    * the registry itself, so two concurrent cross-tier ingests racing
    * their registry flips both land (the loser rebases onto the
    * winner's manifest and appends its own pins as the next epoch)
    * instead of one dying on the single-mutator commit guard. */
  def publish(s: SparkSession, regPath: String, pins: Map[String, Long],
      key: String): Unit =
    Epoch.occ(s, regPath) {
      val cur = Epoch.resolve(s, regPath)
      if (!cur.exists(_.has(key)))
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
        .flatMap(m => m.components.toSeq.map { case (t, v) =>
          // same shape validation as resolvePins — a hand-published
          // registry manifest fails by NAME here, not with a bare
          // NoSuchElement/NumberFormat exception mid-prune
          require(v.size == 1,
            s"Snapshot.pruneAll: registry epoch ${m.epoch} pins " +
              s"${v.size} epochs for tier $t (expected exactly 1)")
          require(v.head.forall(_.isDigit),
            s"Snapshot.pruneAll: registry epoch ${m.epoch} pin for " +
              s"tier $t is not an epoch number: '${v.head}'")
          t -> v.head.toLong
        })
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    tierPaths.foreach { case (tier, path) =>
      val head = Epoch.resolve(s, path).map(_.epoch).getOrElse(0L)
      // keep-count arithmetic: prune retains the newest K manifests,
      // and tier epoch numbers are contiguous (every commit is
      // head+1 — genDir/commit enforce the numbering), so covering
      // the oldest retained pin means keeping head − oldestPin + 1
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
    * last rename lands, composed readers see the PREVIOUS pair.
    *
    * Multi-writer-safe end to end: each tier append commits under
    * [[Epoch.occ]] (a concurrent sweep compaction or second ingest
    * rebases instead of corrupting a shared staging generation), the
    * published pins are the epochs THIS batch's appends produced
    * ([[Epoch.epochWith]] on the batch key — not whatever head a
    * concurrent writer advanced to since, which could pin a postings
    * epoch containing batch B2 beside an IVF epoch without it), and
    * [[publish]] itself rides the registry's own OCC loop. An EMPTY
    * leg (no rows → no tier commit, no ledger key) pins that tier's
    * current head — the newest consistent state the batch observed. */
  def ingestBoth(s: SparkSession, regPath: String, postingsPath: String,
      ivfPath: String, docs: org.apache.spark.sql.DataFrame,
      vectors: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
    Epoch.occ(s, postingsPath) {
      EpochPostings.append(s, docs, postingsPath, batchId)
    }
    Epoch.occ(s, ivfPath) {
      EpochAnn.append(s, vectors, ivfPath, batchId)
    }
    def pinFor(path: String): Long =
      Epoch.epochWith(s, path, s"app_$batchId")
        .getOrElse(Epoch.resolve(s, path).get.epoch)
    publish(s, regPath, Map(
      "postings" -> pinFor(postingsPath),
      "ivf" -> pinFor(ivfPath)),
      s"ing_$batchId")
  }
}
