package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics of the embedding-cosine near-dup operator on planted
  * vectors: identical-direction vectors collapse to the least id, and
  * vectors in other sign-LSH buckets are never even candidates. */
class DedupEmbedSpec extends SparkTestBase {

  test("dedup_embed keeps least-id survivor per near-dup pair") {
    import spark.implicits._
    // 8-d plants: v1 ∥ v0 (same bucket, cos=1); v3 ≈ v2 (same bucket,
    // cos≈1); v4 = -v0 lands in the opposite bucket so it can never pair
    // with v0 despite |cos|=1.
    val up = Seq.fill(8)(1.0f)
    val alt = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val planted = Seq(
      (0L, "a", up),
      (1L, "a", up.map(_ * 2.0f)),
      (2L, "b", alt.toSeq),
      (3L, "b", alt.updated(0, 1.1f).toSeq),
      (4L, "c", up.map(_ * -1.0f)))
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("dembed").toString
    planted.write.parquet(s"$dir/embeddings.parquet")

    val out = graft.SparkEntry.queries("dedup_embed")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("k-means refinement preserves index invariants") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val refined = Ann.build(emb, k = 8, iters = 2)
    assert(refined.assigned.count() === emb.count())
    assert(refined.centroids.size <= 8)
    // every refined centroid is a full-dimension mean vector
    assert(refined.centroids.map(_._2.length).distinct === Seq(64))
  }
}
