package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Width-parametrized LSH: measures how candidate-pair volume responds to
  * signature width, across two corpus sizes (sf0.01 → sf0.1 is 10×
  * documents). The printed `[lsh-sweep]` lines feed SCALE.md's
  * candidate-growth table. Assertions pin the direction: widening the
  * sign bucket / sharpening the band threshold must cut candidates, the
  * narrow sign width must show its super-linear per-vector growth, and
  * the wide width must keep per-vector candidate work bounded. */
class LshWidthSpec extends SparkTestBase {

  private def signPairs(emb: DataFrame, bits: Int): Long =
    emb.select(VectorQueries.signBucket(col("embedding"), bits).as("bucket"))
      .groupBy("bucket").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)

  test("sign-LSH: more bits → fewer candidate pairs; growth tempered at width") {
    val res = for (sf <- Seq("sf0.01", "sf0.1"); bits <- Seq(8, 16)) yield {
      val n = signPairs(
        graft.Tables.embeddings(spark, s"/root/testdata/$sf"), bits)
      println(s"[lsh-sweep] sign sf=$sf bits=$bits candidate_pairs=$n")
      (sf, bits, n)
    }
    val m = res.map { case (sf, b, n) => (sf, b) -> n }.toMap
    // widening cuts candidates by orders of magnitude, at both sizes
    assert(m(("sf0.01", 16)) * 10 < m(("sf0.01", 8)))
    assert(m(("sf0.1", 16)) * 10 < m(("sf0.1", 8)))
    // per-vector candidate work: at the narrow width it RISES with corpus
    // size (buckets saturate → the O(Σb²) super-linear regime); at the
    // wide width it stays bounded — the property that keeps the candidate
    // join linear-ish when the width is sized to the corpus
    val n01 = graft.Tables.embeddings(spark, "/root/testdata/sf0.01").count()
    val n1 = graft.Tables.embeddings(spark, "/root/testdata/sf0.1").count()
    val perVecNarrow01 = m(("sf0.01", 8)).toDouble / n01
    val perVecNarrow1 = m(("sf0.1", 8)).toDouble / n1
    val perVecWide1 = m(("sf0.1", 16)).toDouble / n1
    println(f"[lsh-sweep] sign pairs/vec: 8bit sf0.01=$perVecNarrow01%.3f " +
      f"8bit sf0.1=$perVecNarrow1%.3f 16bit sf0.1=$perVecWide1%.4f")
    assert(perVecNarrow1 > perVecNarrow01,
      "narrow width must show super-linear candidate growth")
    assert(perVecWide1 < 0.1,
      s"wide width must keep per-vector candidate work bounded: $perVecWide1")
  }

  test("MinHash banding: more rows per band → sharper threshold, fewer pairs") {
    val res = for (sf <- Seq("sf0.01", "sf0.1");
        (h, r) <- Seq((8, 2), (16, 4))) yield {
      val docs = graft.Tables.documents(spark, s"/root/testdata/$sf")
      val n = DedupQueries.minhashCandidates(docs, h, r).count()
      println(s"[lsh-sweep] minhash sf=$sf hashes=$h rows=$r candidates=$n")
      (sf, (h, r), n)
    }
    val m = res.map { case (sf, w, n) => (sf, w) -> n }.toMap
    // r=4 bands select at threshold ≈ (1/4)^(1/4) ≈ 0.71 vs r=2's
    // (1/4)^(1/2) = 0.5 → strictly fewer (or equal) candidates
    assert(m(("sf0.01", (16, 4))) <= m(("sf0.01", (8, 2)))
      && m(("sf0.1", (16, 4))) <= m(("sf0.1", (8, 2))))
    val growthNarrow =
      m(("sf0.1", (8, 2))).toDouble / math.max(m(("sf0.01", (8, 2))), 1)
    val growthWide =
      m(("sf0.1", (16, 4))).toDouble / math.max(m(("sf0.01", (16, 4))), 1)
    println(s"[lsh-sweep] minhash growth 10x-corpus: (8,2) ${growthNarrow}x, " +
      s"(16,4) ${growthWide}x")
    assert(growthWide <= growthNarrow,
      s"sharper bands must not grow faster: $growthWide vs $growthNarrow")
  }
}
