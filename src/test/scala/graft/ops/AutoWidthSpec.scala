package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus-sized LSH width choosers close the loop LshWidthSpec's
  * sweep opened: when widths come from the chooser instead of the pinned
  * registry defaults, candidate volume must stay ~LINEAR in corpus size
  * (per-item candidate work bounded) across the 10× sf0.01 → sf0.1 step
  * — the property that keeps the candidate join alive at 100 TB. */
class AutoWidthSpec extends SparkTestBase {

  private def signPairs(emb: DataFrame, bits: Int): Long =
    emb.select(VectorQueries.signBucket(col("embedding"), bits).as("bucket"))
      .groupBy("bucket").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
      .head().getLong(0)

  test("chooser formulas match the sweep-calibrated widths") {
    // the LshWidthSpec sweep showed (8 bits → super-linear, 16 → bounded)
    // for sign-LSH and ((8,2) → super-linear, (16,4) → bounded) for
    // MinHash at the 10× step; the choosers must reproduce the good end
    assert(VectorQueries.signBitsFor(500, 32) === 4)
    assert(VectorQueries.signBitsFor(5000, 32) === 8)
    assert(VectorQueries.signBitsFor(1L << 40, 1024) === 24) // clamped
    assert(VectorQueries.signBitsFor(10, 1024) === 4) // clamped low
    assert(DedupQueries.minhashWidthFor(500) === (8, 2))
    assert(DedupQueries.minhashWidthFor(5000) === (16, 4))
    // monotone: a bigger corpus never gets a narrower signature
    val widths = Seq(1L, 1000L, 100000L, 10000000L)
      .map(n => VectorQueries.signBitsFor(n, 1024))
    assert(widths === widths.sorted)
  }

  test("PQ choosers reproduce the PqTune-calibrated sizes") {
    // the sf0.1 sweep: codes=16/shortlist=50 passes the recall gate at
    // 500 vectors and fails at 2000; codes=64 + 10% shortlist recovers
    assert(VectorQueries.codesFor(500) === 16)
    assert(VectorQueries.codesFor(2000) === 64)
    assert(VectorQueries.codesFor(1L << 40) === 256) // byte-code cap
    assert(VectorQueries.codesFor(1) === 16) // clamped low
    assert(VectorQueries.shortlistFor(500) === 50)
    assert(VectorQueries.shortlistFor(2000) === 200)
    assert(VectorQueries.shortlistFor(1L << 40) === 10000) // capped
    // monotone in corpus size
    val sizes = Seq(1L, 1000L, 100000L, 10000000L)
    assert(sizes.map(VectorQueries.codesFor(_)) ===
      sizes.map(VectorQueries.codesFor(_)).sorted)
    assert(sizes.map(VectorQueries.shortlistFor(_)) ===
      sizes.map(VectorQueries.shortlistFor(_)).sorted)
  }

  test("sign-LSH at chosen widths keeps per-vector candidates ~flat at 10×") {
    val per = Seq("sf0.01", "sf0.1").map { sf =>
      val emb = graft.Tables.embeddings(spark, s"/root/testdata/$sf")
      val n = emb.count()
      val bits = VectorQueries.signBitsFor(n, targetBucket = 32)
      val pairs = signPairs(emb, bits)
      println(s"[auto-width] sign sf=$sf n=$n bits=$bits pairs=$pairs")
      pairs.toDouble / n
    }
    // linear-ish: per-vector work may wobble with bucket balance but must
    // not take the super-linear jump the fixed default shows (>2× here)
    assert(per(1) < per(0) * 2,
      s"per-vector candidates grew super-linearly: ${per(0)} -> ${per(1)}")
  }

  test("MinHash: chooser widths cut volume; shingling restores linearity") {
    // the documents fixture has a 31-word vocabulary, so at the WORD level
    // every doc truly overlaps every doc (median pairwise Jaccard ≈ 0.65)
    // — true positives are intrinsically quadratic and no banding width
    // can fix that. Two properties still hold and are what matter:
    //  1. the chooser's sharper bands cut candidate volume vs the pinned
    //     default on the same corpus (width does its job), and
    //  2. with the right token unit — shingles, which explode the key
    //     space (27k distinct vs 31) — candidate growth at the chosen
    //     widths is ~linear in corpus size, the actual 100 TB shape.
    val shingles = org.apache.spark.sql.functions.array_distinct(
      TextQueries.bigramShingles(col("text")))
    val counts = Seq("sf0.01", "sf0.1").map { sf =>
      val docs = graft.Tables.documents(spark, s"/root/testdata/$sf")
      val n = docs.count()
      val (h, r) = DedupQueries.minhashWidthFor(n)
      val word = DedupQueries.minhashCandidates(docs, h, r).count()
      val wordDefault = DedupQueries.minhashCandidates(docs).count()
      val sh = DedupQueries.minhashCandidates(docs, h, r, shingles).count()
      println(s"[auto-width] minhash sf=$sf n=$n width=($h,$r) " +
        s"word=$word wordDefault=$wordDefault shingle=$sh")
      (n, word, wordDefault, sh)
    }
    // 1. at 10× corpus the chosen width must beat the (8,2) default
    assert(counts(1)._2 < counts(1)._3,
      "chooser width must cut candidates vs the default at 10× corpus")
    // 2. shingled candidates stay ~linear (true near-dups only)
    val growthCorpus = counts(1)._1.toDouble / counts(0)._1
    val growthShingle = counts(1)._4.toDouble / math.max(counts(0)._4, 1)
    assert(growthShingle <= growthCorpus * 1.5,
      s"shingled candidates grew ${growthShingle}x for ${growthCorpus}x corpus")
  }
}
