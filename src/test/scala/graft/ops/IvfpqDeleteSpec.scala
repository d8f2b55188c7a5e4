package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DELETE pins for the compressed serving index: tombstoned ids must
  * vanish from both search phases, full probe + full shortlist over the
  * tombstoned index must EQUAL brute force over the survivors, and
  * compaction drops the rows physically without changing any served
  * answer. */
class IvfpqDeleteSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private val doomedPred = pmod(col("vec_id"), lit(5)) === 2

  private def freshPath(tag: String): String = {
    val path = s"${graft.GraftSession.scratchDir}/ivfpq_delete_$tag"
    Ivfpq.save(Ivfpq.build(emb, k = 4, m = 4, codes = 16), path)
    Ivfpq.delete(spark, path, emb.where(doomedPred).select("vec_id"))
    path
  }

  test("full probe + full shortlist over the tombstoned index equals " +
      "brute force over the survivors") {
    val path = freshPath("main")
    val idx = Ivfpq.load(spark, path)
    val n = emb.count().toInt
    val full = Ivfpq.search(idx, probeId = 0, topK = 5,
      nProbe = idx.centroids.length, shortlist = n)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    val brute = VectorQueries.bruteTopK(spark, sf, 5,
      Some(pmod(col("vec_id"), lit(5)) =!= 2))
      .orderBy("rnk").select("neighbor_id").collect()
      .map(_.getLong(0)).toSeq
    assert(full === brute)
    // no tombstoned id anywhere in the served rows
    val doomed = emb.where(doomedPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(idx.encoded.select("vec_id").collect().map(_.getLong(0))
      .toSet.intersect(doomed).isEmpty)
  }

  test("compact drops encoded rows physically and preserves the " +
      "served search") {
    val path = freshPath("compact")
    val before = Ivfpq.search(Ivfpq.load(spark, path), probeId = 0,
      topK = 5, nProbe = 2, shortlist = 40)
      .collect().map(_.toSeq).toSeq
    val rawBefore = spark.read.parquet(s"$path/encoded").count()
    Ivfpq.compact(spark, path)
    assert(!Layout.dirExists(spark, s"$path/tombstones"))
    assert(spark.read.parquet(s"$path/encoded").count() < rawBefore)
    assert(Ivfpq.search(Ivfpq.load(spark, path), probeId = 0,
      topK = 5, nProbe = 2, shortlist = 40)
      .collect().map(_.toSeq).toSeq === before)
  }
}
