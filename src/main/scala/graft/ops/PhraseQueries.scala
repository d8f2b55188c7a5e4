package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Positional retrieval — exact-phrase search over a POSITIONAL inverted
  * index, the capability layer BM25's bag-of-words postings can't express
  * (reference surface: the keyword search a CAL-ACCESS consumer runs over
  * memo/text columns is LIKE-scans, e.g. the `text_memo_cd` consumption
  * documented in SURVEY §2.6; this tier is the indexed form of the same
  * question, extended to the phrase semantics a real search box needs).
  *
  * Index layout ([[buildPositional]]): the BM25 layout ([[TextQueries]])
  * with the posting row widened to carry the term's sorted 0-based
  * POSITION LIST — `(term, doc_id, dl, positions)` term-range-partitioned
  * and term-sorted, plus the same exact-accumulator corpus stats side
  * table. One layout serves BOTH query families: tf (BM25's per-doc term
  * frequency) is `size(positions)` by construction, so a positional index
  * subsumes a frequency index — which is exactly why production engines
  * (Lucene's default posting format included, a public design) store
  * positions inline with the postings rather than as a second index.
  *
  * Query semantics: a phrase [t0 … tk-1] matches doc d at start position
  * p iff positions(t0) contains p and positions(ti) contains p+i for all
  * i. The match set is computed WITHOUT re-tokenizing anything: each
  * query term's posting rows are read under a pushed `In(term, …)` filter
  * (the `bm25_serve` scan shape), the ≤k frames equi-join on doc_id
  * (bounded by the rarest term's df — the classic conjunctive-query
  * intersection), and the start set is a fold of
  * `array_intersect(acc, positions_i - i)` — per-row array arithmetic,
  * no explode, no shuffle beyond the doc_id joins. Occurrence count and
  * first offset fall out of the same start array for free.
  *
  * 100 TB shape: phrase cost is |posting rows of the query's terms|, not
  * corpus size — the same lookup discipline as BM25 serving; the k-way
  * doc_id join is broadcast-eligible whenever any term is rare (AQE picks
  * it at runtime since each leg is a pushed-filter scan with known
  * stats). Compare the alternative a LIKE-scan pays: every byte of every
  * document on every query. `PhraseSpec` pins the pushed filter, the
  * adjacency fold against hand-checked fixtures (including repeated
  * terms, e.g. "big big"), and serve ≡ tokenize-on-read equality.
  */
object PhraseQueries {

  /** The query phrase shared by all three entries and their oracles —
    * one definition so the Spark forms and the SQL can never drift
    * (the [[TextQueries.bm25Terms]] discipline). Chosen to match a
    * moderate document subset with multi-occurrence docs at sf0.1. */
  private[ops] val phraseTerms = Seq("spark", "merge")

  /** (doc_id, toks, dl) tokenize-on-read projection — same tokenization
    * rule as the BM25 tier (single definition there is private; the
    * rule is the one-split contract both layouts document). */
  private def docProjection(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("dl"))

  /** Positional posting rows of one document set: `(term, doc_id, dl,
    * positions)` with positions the SORTED 0-based offsets of `term` in
    * the doc. Like the BM25 tier's postingRows, every field is
    * per-document state only — an appended segment's rows are identical
    * to what a full rebuild would compute for those docs, so the layout
    * inherits the append story unchanged. */
  private[ops] def positionalRows(proj: DataFrame,
      termFilter: Option[Seq[String]] = None): DataFrame = {
    val exploded = proj.select(col("doc_id"), col("dl"),
      posexplode(col("toks")).as(Seq("pos", "term")))
    // the restriction applies AFTER posexplode — positions are offsets
    // in the ORIGINAL token sequence, never in a filtered view of it
    termFilter.fold(exploded)(ts =>
        exploded.where(col("term").isin(ts: _*)))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(sort_array(collect_list(col("pos").cast(LongType)))
        .as("positions"))
  }

  /** Corpus stats with exact long accumulators — the BM25 layout's
    * statsFrame contract (sum_dl/n_docs_l merge exactly on append). */
  private def statsFrame(proj: DataFrame): DataFrame =
    proj.agg(count(lit(1)).as("n_docs_l"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs_l").cast(DoubleType).as("n_docs"),
        (col("sum_dl").cast(DoubleType) /
          col("n_docs_l").cast(DoubleType)).as("avgdl"),
        col("sum_dl"), col("n_docs_l"))

  /** Materialize the positional index at `path`: term-range-partitioned
    * + term-sorted positional posting lists and the corpus stats table.
    * No df side table — a term's df is exactly the row count of its
    * posting list, and every query here reads its terms' full lists
    * anyway (the pushed-`In` restriction), so df is recovered by a
    * count over rows already in hand instead of a second lookup. */
  def buildPositional(s: SparkSession, docs: DataFrame,
      path: String): Unit = {
    val proj = docProjection(docs)
    positionalRows(proj)
      .repartitionByRange(8, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/lists")
    statsFrame(proj).write.mode("overwrite").parquet(s"$path/stats")
  }

  private val positionalSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedPositionalPath(s: SparkSession, d: String): String =
    graft.BuildOnce.memo(positionalSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/positional_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      buildPositional(s, Tables.documents(s, d), path)
      path
    }

  /** Phrase-match frame from positional posting rows restricted to the
    * phrase's terms: one row per matching doc with the start-position
    * array. The fold intersects each term's positions shifted back by
    * its phrase offset, so a surviving start p proves t_i sits at p+i
    * for every i — repeated phrase terms just intersect the same
    * posting row against itself at two offsets, which is exactly the
    * right semantics ("big big" needs positions p and p+1 both
    * present). Join legs are inner on doc_id: a doc missing ANY phrase
    * term cannot match. */
  private[ops] def phraseStarts(rows: DataFrame,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseStarts: empty phrase")
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      rows.where(col("term") === t)
        .select(col("doc_id"), col("positions").as(s"p$i"))
    }
    val joined = legs.reduce(_.join(_, "doc_id"))
    val starts = phrase.indices.tail.foldLeft(col("p0")) { (acc, i) =>
      array_intersect(acc, transform(col(s"p$i"), x => x - i))
    }
    joined.select(col("doc_id"), starts.as("starts"))
      .where(size(col("starts")) > 0)
  }

  /** (doc_id, n_occ, first_pos) presentation of a match frame — the
    * shared tail of the tokenize-on-read and served forms. */
  private def phraseHits(matches: DataFrame): DataFrame =
    matches.select(col("doc_id"),
        size(col("starts")).cast(LongType).as("n_occ"),
        array_min(col("starts")).as("first_pos"))
      .orderBy("doc_id")

  /** The oracle shared by `phrase_search` and `phrase_serve`: DuckDB
    * re-derives the start set positionally from the token array (1-based
    * list indexing, hence the -1 on the emitted offset), so a hash match
    * proves the index path finds exactly the adjacent occurrences. */
  private val phraseOracle = """
      WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS t
        FROM documents WHERE text IS NOT NULL),
      hits AS (
        SELECT doc_id,
               list_filter(range(1, len(t)), i ->
                 t[i] = 'spark' AND t[i+1] = 'merge') AS starts
        FROM toks)
      SELECT doc_id, CAST(len(starts) AS BIGINT) AS n_occ,
             CAST(list_min(starts) - 1 AS BIGINT) AS first_pos
      FROM hits
      WHERE len(starts) > 0
      ORDER BY doc_id
    """

  /** Exact-phrase match, tokenize-on-read form (the oracle-self-contained
    * twin of [[phraseServe]], `bm25_search`'s discipline): positional
    * rows are built in-query restricted to the phrase terms BEFORE
    * grouping, then the adjacency fold. */
  val phraseSearch = GQuery(
    "phrase_search",
    (s, d) => {
      val rows = positionalRows(docProjection(Tables.documents(s, d)),
        Some(phraseTerms))
      phraseHits(phraseStarts(rows, phraseTerms))
    },
    Some(phraseOracle))

  /** Exact-phrase match over the PERSISTED positional index: pushed
    * `In(term, …)` posting reads, adjacency fold, no tokenization
    * anywhere in the plan. Same oracle as `phrase_search`, so the
    * build→persist→serve roundtrip is itself hash-verified. */
  val phraseServe = GQuery(
    "phrase_serve",
    (s, d) => {
      val path = savedPositionalPath(s, d)
      val rows = s.read.parquet(s"$path/lists")
        .where(col("term").isin(phraseTerms: _*))
      phraseHits(phraseStarts(rows, phraseTerms))
    },
    Some(phraseOracle))

  /** Phrase-constrained BM25 ranking — the "quoted query" a search box
    * actually issues: candidates must contain the phrase EXACTLY, and
    * the survivors rank by the same Okapi BM25 the bag-of-words tier
    * serves ([[TextQueries.bm25ScoreTerm]], shared expression — one
    * scoring definition across both tiers). Everything derives from the
    * ONE pushed-`In` read of the positional lists: tf is
    * `size(positions)` (the subsumption the layout exists for), df is a
    * count over the rows already in hand, the phrase filter is
    * [[phraseStarts]] on the same rows, and only the 1-row stats table
    * is a second read. The phrase-match set joins the scored frame as a
    * broadcast (bounded by the rarest term's df), so ranking cost stays
    * |candidate postings|, corpus-independent. Decimal per-term rounding
    * before the exact sum keeps ordering engine-stable (the
    * `lm_perplexity` ln discipline). */
  val phraseRank = GQuery(
    "phrase_rank",
    (s, d) => {
      val path = savedPositionalPath(s, d)
      val rows = s.read.parquet(s"$path/lists")
        .where(col("term").isin(phraseTerms: _*))
      val stats = s.read.parquet(s"$path/stats")
        .select(col("n_docs"), col("avgdl"))
      val matches = phraseStarts(rows, phraseTerms)
        .select(col("doc_id"),
          size(col("starts")).cast(LongType).as("n_occ"))
      val tf = rows.select(col("term"), col("doc_id"), col("dl"),
        size(col("positions")).cast(DoubleType).as("tf"))
      val dfs = tf.groupBy(col("term"))
        .agg(count(lit(1)).cast(DoubleType).as("df"))
      val scored = tf
        .join(broadcast(dfs), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), TextQueries.bm25ScoreTerm.as("score_term"))
        .groupBy(col("doc_id"))
        .agg(sum(col("score_term")).as("score_dec"))
      scored.join(broadcast(matches), "doc_id")
        .select(col("doc_id"), col("n_occ"),
          col("score_dec").cast(DoubleType).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select(
          row_number().over(Window.orderBy(col("score").desc,
            col("doc_id"))).cast(LongType).as("rnk"),
          col("doc_id"), col("n_occ"), col("score"))
        .orderBy("rnk")
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, str_split(text, ' ') AS t,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
        FROM documents WHERE text IS NOT NULL),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
        FROM docs),
      hits AS (
        SELECT doc_id,
               CAST(len(list_filter(range(1, len(t)), i ->
                 t[i] = 'spark' AND t[i+1] = 'merge')) AS BIGINT) AS n_occ
        FROM docs),
      tf AS (
        SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS term FROM docs)
        WHERE term IN ('spark', 'merge')
        GROUP BY 1, 2, 3),
      dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
               CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl))),
                 4) AS DECIMAL(38,4)) AS score_term
        FROM tf JOIN dfs d USING (term) CROSS JOIN stats s),
      agg AS (
        SELECT doc_id, CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY a.score DESC, a.doc_id) AS BIGINT) AS rnk,
             a.doc_id, h.n_occ, a.score
      FROM agg a JOIN hits h USING (doc_id)
      WHERE h.n_occ > 0
      ORDER BY a.score DESC, a.doc_id
      LIMIT 10
    """))

  def all: Seq[GQuery] = Seq(phraseSearch, phraseServe, phraseRank)
}
