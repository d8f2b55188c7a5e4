package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DELETE-lifecycle pins for the persisted IVF index: tombstoned ids
  * must vanish from every served plan without the cell directories
  * being touched; full probing over the tombstoned index must EQUAL
  * brute force over the survivors (cosine carries no cross-document
  * state, so delete ≡ rebuild-with-these-centroids exactly);
  * re-delivered/unknown batches are no-ops; and compaction drops the
  * rows physically, clears the segment, and changes no served
  * answer. */
class AnnDeleteSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private val doomedPred = pmod(col("vec_id"), lit(5)) === 2

  private def freshDeletedPath(tag: String): String = {
    val path = s"${graft.GraftSession.scratchDir}/ann_delete_$tag"
    Ann.save(Ann.build(emb, k = 4), path)
    Ann.delete(spark, path, emb.where(doomedPred).select("vec_id"))
    path
  }

  test("tombstoned ids vanish from load; full probing equals brute " +
      "force over the survivors") {
    val path = freshDeletedPath("main")
    val idx = Ann.load(spark, path)
    val served = idx.assigned.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    val doomed = emb.where(doomedPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(served.intersect(doomed).isEmpty)
    assert(served.size === emb.count() - doomed.size)
    // exactness: probing EVERY cell reproduces the brute-force top-5
    // over the survivors — delete ≡ rebuild with these centroids
    val full = Ann.query(idx, probeId = 0, topK = 5, nProbe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    val brute = VectorQueries.bruteTopK(spark, sf, 5,
      Some(pmod(col("vec_id"), lit(5)) =!= 2))
      .orderBy("rnk").select("neighbor_id").collect()
      .map(_.getLong(0)).toSeq
    assert(full === brute)
    // the cell restriction still prunes below the tombstone anti-join:
    // the parquet scan itself carries the partition filter
    val plan = idx.assigned.filter(col("cell").isin(0L, 1L))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("re-delivered and unknown-id delete batches are no-ops") {
    val path = freshDeletedPath("redeliver")
    def tombRows() = spark.read.parquet(s"$path/tombstones")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val t1 = tombRows()
    Ann.delete(spark, path, emb.where(doomedPred).select("vec_id"))
    assert(tombRows() === t1)
    import spark.implicits._
    Ann.delete(spark, path, Seq(999999L, 888888L).toDF("vec_id"))
    // unknown ids are harmless: the segment may note them or skip them,
    // but the SERVED id set must be unchanged
    val served = Ann.load(spark, path).assigned.select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val doomed = emb.where(doomedPred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(served.intersect(doomed).isEmpty)
    assert(served.size === emb.count() - doomed.size)
  }

  test("append refuses a batch that re-adds a tombstoned id until " +
      "compact folds the delete in") {
    val path = freshDeletedPath("readd")
    val readd = emb.where(col("vec_id") === 2L) // 2 % 5 == 2: doomed
    val e = intercept[IllegalArgumentException] {
      Ann.append(spark, path, readd)
    }
    assert(e.getMessage.contains("tombstoned"))
    Ann.compact(spark, path)
    Ann.append(spark, path, readd)
    assert(Ann.load(spark, path).assigned
      .filter(col("vec_id") === 2L).count() === 1L)
  }

  test("compact drops rows physically, clears the segment, and " +
      "preserves every served answer") {
    val path = freshDeletedPath("compact")
    val beforeRows = Ann.load(spark, path).assigned
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val beforeQuery = Ann.query(Ann.load(spark, path),
      probeId = 0, topK = 5, nProbe = 3)
      .collect().map(_.toSeq).toSeq
    val rawBefore = spark.read.parquet(s"$path/assigned").count()
    Ann.compact(spark, path)
    assert(!Layout.dirExists(spark, s"$path/tombstones"))
    val rawAfter = spark.read.parquet(s"$path/assigned").count()
    assert(rawAfter < rawBefore, "compact removed no rows")
    val afterRows = Ann.load(spark, path).assigned
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(afterRows === beforeRows)
    assert(Ann.query(Ann.load(spark, path), probeId = 0, topK = 5,
      nProbe = 3).collect().map(_.toSeq).toSeq === beforeQuery)
    // compact with no tombstones is a no-op (idempotent re-run)
    Ann.compact(spark, path)
    assert(Ann.load(spark, path).assigned.count() === afterRows.size)
  }
}
