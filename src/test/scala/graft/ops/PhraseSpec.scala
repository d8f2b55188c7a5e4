package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins for the positional retrieval tier ([[PhraseQueries]]):
  *
  *  - the adjacency fold against hand-checked fixtures — multi-occurrence
  *    phrases, REPEATED phrase terms ("big big": the same posting row
  *    intersected against itself at two offsets), trigrams, and the
  *    no-match-despite-both-terms case post-AND-filtering would get wrong;
  *  - positions are offsets in the ORIGINAL token sequence even when the
  *    build restricts to the query's terms (the tokenize-on-read form
  *    restricts AFTER posexplode — restricting before it would renumber
  *    every token and silently "match" non-adjacent terms);
  *  - serve ≡ tokenize-on-read equality row for row (the persisted
  *    roundtrip, `bm25_serve`'s discipline);
  *  - the term restriction reaches the positional lists scan as a pushed
  *    parquet `In(term, …)` filter — the layout earns its keep in the
  *    plan, not just in the result.
  */
class PhraseSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "big data big data big"),     // "big data" starts at 0 and 2
      (2L, "big big data"),              // "big big" at 0; "big data" at 1
      (3L, "data big"),                  // reversed: no "big data"
      (4L, "big slow data"),             // both terms, NOT adjacent
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
  }

  private def hits(phrase: Seq[String]) = {
    val proj = fixture.where(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))
    PhraseQueries.phraseStarts(
        PhraseQueries.positionalRows(proj, Some(phrase.distinct)), phrase)
      .select(col("doc_id"), col("starts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
  }

  test("adjacency fold: bigram occurrences at original offsets") {
    val h = hits(Seq("big", "data"))
    assert(h === Map(1L -> Seq(0L, 2L), 2L -> Seq(1L)))
  }

  test("adjacency fold: repeated phrase term intersects one posting row") {
    assert(hits(Seq("big", "big")) === Map(2L -> Seq(0L)))
  }

  test("adjacency fold: trigram with overlapping occurrences") {
    // "big data big data big": the trigram matches at starts 0 AND 2
    // (occurrences may overlap — start-set semantics, not a scan cursor)
    assert(hits(Seq("big", "data", "big")) === Map(1L -> Seq(0L, 2L)))
  }

  test("doc with both terms but no adjacency does not match") {
    assert(!hits(Seq("big", "data")).contains(4L))
  }

  test("served phrase results equal the tokenize-on-read form") {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("first_pos")))
        .sortBy(_._1).toSeq
    val served = rows("phrase_serve")
    assert(served === rows("phrase_search"))
    assert(served.nonEmpty)
  }

  test("phrase_rank rows are exactly the phrase matches, BM25-ordered") {
    val ranked = graft.SparkEntry.queries("phrase_rank")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_occ"), r.getAs[Double]("score")))
      .sortBy(_._1).toSeq
    val matches = graft.SparkEntry.queries("phrase_search")(spark, sf)
      .select("doc_id", "n_occ").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranked.nonEmpty && ranked.size <= 10)
    ranked.foreach { case (_, id, nOcc, _) =>
      assert(matches.get(id).contains(nOcc), s"doc $id not a phrase match")
    }
    // scores weakly decrease with rank (doc_id tie-break)
    ranked.sliding(2).foreach {
      case Seq((_, ida, _, sa), (_, idb, _, sb)) =>
        assert(sa > sb || (sa == sb && ida < idb))
      case _ =>
    }
  }

  test("term restriction is pushed into the positional lists scan") {
    val path = PhraseQueries.savedPositionalPath(spark, sf)
    val plan = spark.read.parquet(s"$path/lists")
      .where(col("term").isin("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"), plan)
  }
}
