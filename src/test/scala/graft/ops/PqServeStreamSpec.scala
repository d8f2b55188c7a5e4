package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming serving against the compressed index
  * (`StreamRunner.pqServeStream`): micro-batched probes answered
  * through `Ivfpq.knnJoin` must equal the static join on the same
  * probes — the batch/stream unification contract, with the
  * distinguishing property that the probe batch is never collected. */
class PqServeStreamSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("streamed compressed serving equals the static Ivfpq.knnJoin " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    val index = Ivfpq.build(emb, k = 8, m = 4, codes = 16)
    // probes in their own id space (1000+), vectors borrowed from the
    // corpus — external requests, excludeSelf=false semantics
    val probeRows: Seq[(Long, Array[Float])] = emb
      .filter(col("vec_id") < 6)
      .select(col("vec_id") + 1000L, col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq
    val source = MemoryStream[(Long, Array[Float])]
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    val q = graft.streaming.StreamRunner.pqServeStream(index,
      source.toDF().toDF("probe_id", "probe_emb"), topK = 5, nProbe = 3,
      shortlist = 20) { out =>
      results.synchronized {
        results ++= out.collect().map(r => (r.getAs[Long]("probe_id"),
          r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
      }
    }
    val (first, second) = probeRows.splitAt(3)
    source.addData(first: _*)
    q.processAllAvailable()
    source.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    val static = Ivfpq.knnJoin(index,
      probeRows.toDF("probe_id", "probe_emb"),
      topK = 5, nProbe = 3, shortlist = 20, excludeSelf = false)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(results.sortBy(t => (t._1, t._2)).toSeq === static)
    assert(static.nonEmpty)
  }
}
