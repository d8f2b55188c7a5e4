package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** kNN-join pins: the row-side cell routing must reproduce the
  * driver-side routing of `Ann.query` exactly (same (−sim, cid)
  * tie-breaks), full probing must degenerate to exact per-probe top-k,
  * and the plan must stay cartesian-free — the probe side meets the
  * inverted lists only through the equi-join on cell. */
class KnnJoinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val index = Ann.build(emb, k = 8)

  private def probesOf(ids: Long*) = emb
    .filter(col("vec_id").isin(ids: _*))
    .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))

  test("single-probe kNN join reproduces Ann.query row for row") {
    val viaJoin = Ann.knnJoin(index, probesOf(0L), topK = 5, nProbe = 3)
      .select("neighbor_id", "rank").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sortBy(_._1).toSeq
    val viaQuery = Ann.query(index, probeId = 0, topK = 5, nProbe = 3)
      .select("neighbor_id", "rank").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sortBy(_._1).toSeq
    assert(viaJoin === viaQuery)
  }

  test("full-probe kNN join equals exact per-probe top-k") {
    val ids = Seq(0L, 7L, 42L)
    val joined = Ann.knnJoin(index, probesOf(ids: _*), topK = 5, nProbe = 8)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id")))
      .sortBy(t => (t._1, t._2)).toSeq
    val exact = ids.flatMap { pid =>
      Ann.query(index, probeId = pid, topK = 5, nProbe = 8)
        .collect().map(r => (pid, r.getAs[Long]("rank"),
          r.getAs[Long]("neighbor_id")))
    }.sortBy(t => (t._1, t._2))
    assert(joined === exact)
  }

  test("excludeSelf=false keeps an id-colliding neighbor (external ids)") {
    // probe id 0 collides with index id 0; with exclusion off the row's
    // own vector is a valid neighbor (sim = 1) — the external-id-space
    // contract where a collision must NOT silently drop a candidate
    val kept = Ann.knnJoin(index, probesOf(0L), topK = 5, nProbe = 3,
        excludeSelf = false)
      .filter(col("neighbor_id") === 0L).collect()
    assert(kept.length === 1)
    assert(kept.head.getAs[Long]("rank") === 1L)
    val dropped = Ann.knnJoin(index, probesOf(0L), topK = 5, nProbe = 3)
      .filter(col("neighbor_id") === 0L).count()
    assert(dropped === 0L)
  }

  test("kNN join plan is cartesian-free and joins on cell") {
    val plan = Ann.knnJoin(index, probesOf(0L, 1L), topK = 5, nProbe = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.toLowerCase.contains("cell"), plan)
  }
}
