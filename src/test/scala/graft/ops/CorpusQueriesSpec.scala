package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the corpus-curation layer beyond the DuckDB hash gate:
  * the scrubber actually fires and leaves no PII behind, the chunk-dedup
  * filter removes something and preserves per-doc structure, and the
  * end-to-end clean pipeline only emits docs every stage admits. */
class CorpusQueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("pii_scrub fires on every row and leaves no PII behind") {
    val out = CorpusQueries.piiScrub.fn(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // every row had exactly one synthesized email and one IP
    assert(out.filter(col("n_emails") =!= 1 || col("n_ips") =!= 1)
      .count() === 0)
    // nothing matching any PII pattern survives the scrub
    val residue = out.filter(
      col("scrubbed").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
        col("scrubbed").rlike("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b") ||
        col("scrubbed").rlike("\\+?\\d[\\d-]{7,}\\d"))
    assert(residue.count() === 0)
    // and the masks are present
    assert(out.filter(!col("scrubbed").contains("<EMAIL>")).count() === 0)
    out.unpersist()
  }

  test("scrubPii is idempotent — masks never re-match a PII pattern") {
    import spark.implicits._
    val dirty = Seq(
      "mail a.b_c%x@sub.domain.org now",
      "call +1-555-0100-99 or 555-123-4567",
      "host 192.168.0.1 and 10.0.255.3",
      "mixed bob@x.co at 8.8.8.8 tel 555-000-1111",
      "clean text with no pii at all")
      .toDF("t")
    val once = dirty.select(CorpusQueries.scrubPii(col("t")).as("s"))
    val twice = once.select(CorpusQueries.scrubPii(col("s")).as("s"))
    assert(once.collect().map(_.getString(0)).toSeq ===
      twice.collect().map(_.getString(0)).toSeq)
  }

  test("line_dedup keeps per-doc structure and the filter fires") {
    val out = CorpusQueries.lineDedup.fn(spark, sf).cache()
    assert(out.filter(col("n_kept") > col("n_chunks")).count() === 0)
    // surviving text has exactly n_kept chunks' worth of separators:
    // rebuilt clean_text token groups == n_kept (empty text ⇒ 0)
    val bad = out.filter(col("n_kept") > 0 &&
      size(split(col("clean_text"), " ")) < col("n_kept"))
    assert(bad.count() === 0)
    // corpus-frequency filter must actually drop something at this SF
    val sums = out.agg(sum("n_chunks"), sum("n_kept")).head()
    assert(sums.getLong(1) < sums.getLong(0))
    out.unpersist()
  }

  test("token_histogram buckets partition the length range") {
    val rows = CorpusQueries.tokenHistogram.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= lo && mx < lo + 25 && mn <= mx)
    }
  }

  test("profile_stats sees every row of every profiled column") {
    val rows = CorpusQueries.profileStats.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Set("lang", "source", "n_chars"))
    val counts = rows.map(_.getLong(1)).toSet
    assert(counts.size === 1) // one scan, same row count per column
  }

  test("lm_perplexity's smoothed model is a proper distribution; the cut splits") {
    import org.apache.spark.sql.types.DoubleType
    val docs = graft.Tables.documents(spark, sf)
      .where(size(split(col("text"), " ")) >= 2)
    val bc = docs.select(
      explode(TextQueries.ngramShingles(col("text"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val allToks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .select("tok").distinct().collect().map(_.getString(0))
    val v = allToks.length.toDouble
    // context counts from bigram starts, as the query derives them
    val vocab = bc.toSeq
      .groupBy { case (bg, _) => bg.split(" ")(0) }
      .map { case (w1, gs) => w1 -> gs.map(_._2).sum }.toSeq
    // For each context w1: sum over ALL w2 in vocab of
    // (c12 + 0.5)/(c1 + 0.5V) must be exactly 1 (observed mass +
    // smoothing mass) — the add-alpha model is a true distribution,
    // so avg_nll is a real cross-entropy, not an ad-hoc score.
    vocab.take(10).foreach { case (w1, c1) =>
      val mass = allToks.map { w2 =>
        (bc.getOrElse(s"$w1 $w2", 0L) + 0.5) / (c1 + 0.5 * v)
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $w1: mass $mass")
    }
    val out = CorpusQueries.lmPerplexity.fn(spark, sf)
      .agg(sum(when(col("lm_keep"), 1).otherwise(0)).as("kept"),
        count(lit(1)).as("n"))
      .collect()(0)
    val (kept, n) = (out.getLong(0), out.getLong(1))
    assert(kept > 0 && kept < n,
      s"perplexity cut must split the corpus: kept=$kept of $n")
  }

  test("constraint suite: clean data all-green; each injection trips its one check") {
    val report = CorpusQueries.constraintReport(
        graft.Tables.orders(spark, sf), graft.Tables.customer(spark, sf))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(report.size === 7)
    report.foreach { case (c, (m, ok)) =>
      assert(m === 0L && ok, s"clean data must satisfy $c (metric=$m)")
    }
    val dirty = CorpusQueries.constraintCheck.fn(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    val nBase = graft.Tables.orders(spark, sf)
      .where(pmod(col("o_orderkey"), lit(997)) === 0).count()
    assert(nBase > 0)
    dirty.foreach { case (c, (m, ok)) =>
      if (c == "row_count_positive") assert(m === 0L && ok)
      else assert(m === nBase && !ok,
        s"$c must fire exactly once per injected row: metric=$m vs $nBase")
    }
  }

  test("corpus_clean emits only docs every stage admits") {
    val out = CorpusQueries.corpusClean.fn(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("doc_id") < 50).count() === 0)
    assert(out.filter(col("n_tok") < 30).count() === 0)
    assert(out.filter(!col("split").isin("train", "val", "test"))
      .count() === 0)
    // deterministic: a second run is identical
    val again = CorpusQueries.corpusClean.fn(spark, sf)
    assert(out.exceptAll(again).count() === 0 &&
      again.exceptAll(out).count() === 0)
    out.unpersist()
  }
}
