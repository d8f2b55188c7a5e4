package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the transitive-
  * closure step that turns pairwise near-dup matches into whole duplicate
  * CLUSTERS (SURVEY §2.10 X2/X3: a one-pass "keeper pointer" collapses a
  * pair, but a chain a~b~c must collapse to ONE survivor, which needs the
  * full closure).
  *
  * Algorithm: iterated min-label propagation with path compression.
  * Every node starts labeled with its own id; each round does
  *
  *   1. neighbor-min: label(v) ← min(label(v), min over edges (u,v) of
  *      label(u)) — one equi-join edges⋈labels plus one groupBy(dst) MIN,
  *      both map-side combinable, shuffling only (node, candidate-label)
  *      pairs;
  *   2. path compression (pointer jumping): label(v) ← label(label(v)) —
  *      a self-join of the label table. Every label IS a node id, so the
  *      join always resolves; this halves pointer chains each round,
  *      giving O(log diameter) convergence where pure propagation would
  *      pay one round per hop.
  *
  * Convergence detection is a single cheap aggregate, not a join: labels
  * are non-negative and MONOTONICALLY non-increasing per node, so
  * sum(labels) is strictly decreasing until the fixpoint — an unchanged
  * sum proves an unchanged table. Each round ends in a checkpoint,
  * truncating lineage so round N is a shallow plan over round N−1's
  * materialized blocks instead of a 2^N-deep recompute tree (same
  * driver-held-state discipline as `Ann.build`'s k-means loop). Once a
  * round's checkpoint has materialized, the PREVIOUS round's blocks are
  * explicitly unpersisted — executor storage holds at most two label
  * snapshots regardless of round count, instead of growing linearly.
  *
  * Checkpoint durability: by default rounds use `localCheckpoint`
  * (executor-local blocks — fast, but an executor loss mid-job forces a
  * rerun, which local[n] can't hit). When the SparkContext has a
  * checkpoint dir configured (`sc.setCheckpointDir`, typically on HDFS/
  * object storage for a real cluster), rounds automatically use RELIABLE
  * checkpoints instead, so a 100 TB run survives executor churn. On the
  * reliable path each round's files are deleted as soon as the NEXT
  * round's checkpoint has materialized (Spark only auto-cleans with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` plus a GC,
  * which a tight loop can't rely on), so checkpoint-dir storage holds at
  * most two label snapshots regardless of round count; only the final
  * fixpoint's files survive, and they back the returned frame.
  *
  * Scale: per round the work is one shuffle of the edge list keyed by dst
  * plus one shuffle of the label table keyed by label — both linear in
  * |E|+|V|; rounds are O(log d) for diameter d (near-dup clusters are
  * shallow — d rarely exceeds tens even at corpus scale). This is the
  * same join-primitive family as the MapReduce large-star/small-star
  * algorithm; min-propagation + compression keeps the per-round plan to
  * two exchanges and is a fixpoint of the identical invariant (every
  * node labeled with its component's minimum id).
  */
object Components {

  /** Label every node with the MINIMUM node id of its connected
    * component.
    *
    * @param nodes single-column frame of node ids (long)
    * @param edges two-column frame (src, dst) of undirected edges; ids
    *              must appear in `nodes`. Direction is irrelevant —
    *              edges are symmetrized internally.
    * @return frame (id, component) where component = min id reachable
    * @throws IllegalStateException if the fixpoint is not reached within
    *         `maxRounds` (2^maxRounds ≥ diameter always holds for
    *         maxRounds = 30 on any graph with < 10^9 nodes, so hitting
    *         this means the input violates the contract, e.g. edge
    *         endpoints missing from `nodes`)
    */
  def connected(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 30): DataFrame = {
    val idCol = nodes.columns.head
    val Seq(srcCol, dstCol) = edges.columns.toSeq.take(2)
    // r20 guide §1.2/§5: the edge list is read by EVERY round's
    // neighbor-min join, and the edges the callers pass are themselves
    // expensive pipelines (LSH banding + exact-Jaccard verification) —
    // without persistence each round re-executed that whole DAG.
    // r21 refinement: r20 persisted the SYMMETRIZED union lazily, so
    // materialization (inside round 1) still evaluated the caller's
    // pipeline once per union branch — two racing AQE stages, profiled
    // as the bulk of dedup_cluster's time. Materialize the UNSYMMETRIZED
    // list eagerly once (half the stored rows, one pipeline evaluation,
    // reliable checkpoint when a checkpoint dir is configured — the
    // same durability discipline as the label rounds) and derive the
    // symmetric view per round from the materialized blocks.
    val (e0, e0Rdd) = materializeEdges(edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
    var (labels, labelsRdd, prevSum) = materialize(nodes
      .select(col(idCol).as("id"), col(idCol).as("component")))
    var round = 0
    var converged = false
    while (!converged) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"Components.connected: no fixpoint after $maxRounds rounds — " +
            "are all edge endpoints present in `nodes`?")
      // 1. neighbor-min
      val nbrMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("nbr_min"))
      val propagated = labels
        .join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(labels("component"),
            coalesce(col("nbr_min"), labels("component"))).as("component"))
      // 2. path compression: component ← component(component)
      val ptr = propagated
        .select(col("id").as("pid"), col("component").as("pcomp"))
      val (compressed, compressedRdd, s) = materialize(propagated
        .join(ptr, propagated("component") === ptr("pid"))
        .select(propagated("id"), col("pcomp").as("component")))
      // this round's checkpoint now exists; the previous round's labels
      // can never be read again — drop the blocks AND (reliable path)
      // the files, so storage stays O(1) in rounds on both tiers
      release(labels, labelsRdd)
      converged = s == prevSum
      prevSum = s
      labels = compressed
      labelsRdd = compressedRdd
    }
    release(e0, e0Rdd)
    labels
  }

  /** Materialize an edge frame once, with the same durability discipline
    * as the label rounds: reliable checkpoint when the context has a
    * checkpoint dir (cluster runs — survives executor churn), local
    * checkpoint blocks otherwise. Returns the frame and the internal RDD
    * handle so [[release]] can free blocks/files at the fixpoint. */
  private def materializeEdges(df: DataFrame): (DataFrame, RDD[_]) = {
    val reliable =
      df.sparkSession.sparkContext.getCheckpointDir.isDefined
    val cp = if (reliable) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = df.checkpoint(eager = true)
      df.unpersist(blocking = false)
      out
    } else df.localCheckpoint(eager = true)
    val rdd = cp.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l.rdd
    }.getOrElse(throw new IllegalStateException(
      "checkpointed edge plan is not a LogicalRDD")) // can't happen
    (cp, rdd)
  }

  /** Checkpoint a label table, returning the lineage-truncated frame and
    * the internal checkpointed RDD handle (kept so the caller can free
    * blocks/files once the round is superseded — `Dataset.checkpoint`
    * alone gives no handle). Works on the internal-row RDD via
    * `Dataset.checkpoint`/`localCheckpoint`, NOT `df.rdd` — the external
    * `Row` round-trip would deserialize and re-encode every row every
    * round, a pure serialization tax on the hot loop. Reliable
    * checkpointing is used when the context has a checkpoint dir
    * (cluster runs); executor-local blocks otherwise. On the reliable
    * path the frame is cached MEMORY_AND_DISK first so the
    * checkpoint-write job reads cached blocks instead of recomputing the
    * full join lineage (and disk-backed so eviction can't silently
    * reintroduce that recompute); the cache is dropped as soon as the
    * files are durable. */
  private def materialize(df: DataFrame): (DataFrame, RDD[_], Long) = {
    val reliable =
      df.sparkSession.sparkContext.getCheckpointDir.isDefined
    val (cp, sum) = if (reliable) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      // r21 guide §5 (driver round-trips): the convergence checksum IS
      // the cache-materializing action — one job computes the round's
      // labels, populates the cache, and proves (non-)convergence,
      // where r20 paid a separate checksum job per round
      val s = checksum(df)
      val out = df.checkpoint(eager = true)
      df.unpersist(blocking = false) // files are durable; cache is dead
      (out, s)
    } else {
      // local path, same fold: mark the plan for local checkpointing
      // LAZILY, then let the checksum aggregate be the first (and only)
      // action — its pass computes every partition, the marked storage
      // level persists the blocks as they materialize, and job-end
      // doCheckpoint() finds nothing left to save. One job per round
      // instead of two; blocks and values identical.
      val out = df.localCheckpoint(eager = false)
      (out, checksum(out))
    }
    val rdd = cp.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l.rdd
    }.getOrElse(throw new IllegalStateException(
      "checkpointed plan is not a LogicalRDD")) // can't happen
    (cp, rdd, sum)
  }

  /** Free a superseded round: unpersist its blocks (the local-checkpoint
    * storage) and delete its reliable checkpoint files if any. Only
    * called once the NEXT round's checkpoint has materialized, so the
    * data is provably unreachable. */
  private def release(df: DataFrame, rdd: RDD[_]): Unit = {
    rdd.unpersist(blocking = false)
    rdd.getCheckpointFile.foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  /** sum(component) — monotone under label updates, so equality across
    * rounds is a convergence proof, not a heuristic. */
  private def checksum(labels: DataFrame): Long =
    labels.agg(sum(col("component"))).head().getLong(0)
}
