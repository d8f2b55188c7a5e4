package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamRunner
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Batch + streaming serving over a built IVF index: `Ann.serveBatch`
  * must reproduce `Ann.query` probe-for-probe (shared tie-breaks), and
  * the micro-batch serving stream must converge to the same rows. */
class AnnServeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val index = Ann.build(emb, k = 8)

  private def probeVec(id: Long): Seq[Double] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    emb.filter(col("vec_id") === id)
      .select(transform(col("embedding"), _.cast(DoubleType)))
      .head().getSeq[Double](0).toSeq
  }

  private def asTriples(rows: Array[Row]): Seq[(Long, Long, Long)] =
    rows.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Long]("rank"))).toSeq.sorted

  test("serveBatch with one resident probe reproduces Ann.query exactly") {
    val viaQuery = Ann.query(index, probeId = 0, topK = 5, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Long]("rank"))).toSeq
    val viaServe = Ann.serveBatch(index, Seq((0L, probeVec(0))),
      topK = 5, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"), r.getAs[Long]("rank"))).toSeq
      .sortBy(_._3)
    assert(viaServe === viaQuery) // ids, sims, AND ranks — bit-equal sims
  }

  test("a multi-probe batch serves every probe like its own query") {
    val ids = Seq(0L, 1L, 2L)
    val batch = Ann.serveBatch(index, ids.map(i => (i, probeVec(i))),
      topK = 4, nProbe = 3).collect()
    assert(asTriples(batch).map(_._1).distinct === ids)
    for (id <- ids) {
      val single = Ann.query(index, probeId = id, topK = 4, nProbe = 3)
        .collect().map(r => (id, r.getAs[Long]("neighbor_id"),
          r.getAs[Long]("rank"))).toSeq.sorted
      assert(asTriples(batch.filter(_.getAs[Long]("probe_id") == id))
        === single, s"probe $id diverged")
    }
  }

  test("the serving stream converges to the batch result per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val source = MemoryStream[AnnServeSpec.Probe]
    val q = StreamRunner.annServeStream(index, source.toDF(),
      topK = 4, nProbe = 3) { served =>
      results.synchronized { results ++= asTriples(served.collect()) }
    }
    try {
      source.addData(AnnServeSpec.Probe(0L, probeVec(0)))
      q.processAllAvailable()
      source.addData(AnnServeSpec.Probe(1L, probeVec(1)),
        AnnServeSpec.Probe(2L, probeVec(2)))
      q.processAllAvailable()
    } finally q.stop()
    val batch = Ann.serveBatch(index,
      Seq(0L, 1L, 2L).map(i => (i, probeVec(i))), topK = 4, nProbe = 3)
    assert(results.sorted === asTriples(batch.collect()))
  }
}

object AnnServeSpec {
  final case class Probe(probe_id: Long, embedding: Seq[Double])
}
