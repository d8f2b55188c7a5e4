package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GQuery

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of the keyword tier
  * (BM25 over the inverted index, X10) and the vector tier (cosine ANN,
  * X3/X9). This is the composed retrieval shape a training-data /
  * retrieval pipeline actually runs: a query carries text terms AND an
  * embedding, each tier returns its own ranked list, and the fused
  * ranking is Σ_lists 1/(K + rank) with K = 60 (the standard RRF
  * constant — rank-only fusion, deliberately insensitive to the two
  * tiers' incomparable score scales).
  *
  * The reference has no retrieval tier at all (it delegates querying to
  * the RDBMS — SURVEY.md §1); both member tiers and this fusion are the
  * beyond-reference LLM-pipeline surface the build mandates.
  *
  * Determinism discipline (the registry's decimal rule): each 1/(K+r)
  * contribution is rounded to 6 decimals and cast DECIMAL(38,6) BEFORE
  * the per-doc sum — the sum of ≤2 exact decimals is exact and
  * order-independent, so fused ordering (tie-break doc_id) can never
  * split the engines. No K+r in range terminates at exactly 7 decimal
  * digits, so cross-engine rounding-mode edge cases cannot arise.
  *
  * Scale: fusion itself is a full-outer join of two ≤topK-row lists —
  * driver-free, bounded by the requested k, never by the corpus. The
  * corpus-scale work lives entirely in the member tiers, each already
  * built for 100 TB (pushed `In(term,…)` postings reads; IVF cell
  * pruning); for a BATCH of queries the same fusion runs per query_id
  * over `bm25ServeBatch` × `Ann.serveBatch` outputs as a (query_id,
  * doc_id) equi-join — identical arithmetic, one more grouping column.
  */
object HybridQueries {

  /** Standard RRF smoothing constant (Cormack et al.'s k = 60). */
  private val RrfK = 60

  /** Keyword-list depth — matches the BM25 entries' top-10. */
  private val KwTopK = 10

  /** One list contribution: round(1/(K + rank), 6) as exact decimal;
    * NULL rank (doc absent from that list) → NULL, coalesced to 0 by
    * the fusion sum. */
  private def rrfTerm(rnk: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    round(lit(1.0) / (lit(RrfK.toDouble) + rnk.cast(DoubleType)), 6)
      .cast(DecimalType(38, 6))

  /** Fuse two ranked lists (doc_id, kw_rnk) ⋈ (doc_id, vec_rnk) into
    * the RRF ranking. Emits EVERY fused doc (≤ kw_k + vec_k rows, the
    * union), ordered by fused score desc then doc_id — the single-
    * partition window is over a by-construction-bounded frame, the
    * bm25TopK discipline. ONE definition behind the exact and served
    * entries so their arithmetic cannot drift. */
  private def rrfFuse(kw: DataFrame, vec: DataFrame): DataFrame = {
    val zero = lit(BigDecimal(0)).cast(DecimalType(38, 6))
    kw.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("kw_rnk"), col("vec_rnk"),
        (coalesce(rrfTerm(col("kw_rnk")), zero) +
          coalesce(rrfTerm(col("vec_rnk")), zero))
          .cast(DoubleType).as("rrf"))
      .select(
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id")))
          .cast(LongType).as("rnk"),
        col("doc_id"), col("kw_rnk"), col("vec_rnk"), col("rrf"))
      .orderBy("rnk")
  }

  /** The exact keyword list: BM25 top-10 (the oracle-verified
    * `bm25_search` pipeline verbatim) as (doc_id, kw_rnk). */
  private def kwExact(s: SparkSession, d: String): DataFrame =
    TextQueries.bm25Search.fn(s, d)
      .select(col("doc_id"), col("rnk").as("kw_rnk"))

  /** The exact vector list: brute-force cosine top-`IvfTopK` of probe
    * vec_id 0 (the `sim_topk` implementation verbatim — doc_id ≡ vec_id
    * across the documents/embeddings tables) as (doc_id, vec_rnk). */
  private def vecExact(s: SparkSession, d: String): DataFrame =
    VectorQueries.bruteTopK(s, d, VectorQueries.IvfTopK)
      .select(col("neighbor_id").as("doc_id"), col("rnk").as("vec_rnk"))

  /** X3+X10 hybrid retrieval, exact form: RRF-fuse the BM25 top-10 and
    * the brute-force cosine top-5 for the (terms, embedding-of-doc-0)
    * query. Both member lists are byte-identical to their own
    * oracle-verified entries (`bm25_search`, `sim_topk`), so this entry
    * hash-verifies exactly the fusion arithmetic on top of them. */
  val hybridSearch = GQuery(
    "hybrid_search",
    (s, d) => rrfFuse(kwExact(s, d), vecExact(s, d)),
    Some(s"""
      WITH docs AS (
        SELECT doc_id, str_split(text, ' ') AS toks,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
        FROM documents WHERE text IS NOT NULL),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
        FROM docs),
      tf AS (
        SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs)
        WHERE term IN ('spark', 'merge', 'filter')
        GROUP BY 1, 2, 3),
      dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
               CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl))),
                 4) AS DECIMAL(38,4)) AS score_term
        FROM tf JOIN dfs d USING (term) CROSS JOIN stats s),
      kwagg AS (
        SELECT doc_id, CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1),
      kw AS (
        SELECT doc_id, kw_rnk FROM (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS kw_rnk
          FROM kwagg)
        WHERE kw_rnk <= $KwTopK),
      probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0),
      vec AS (
        SELECT doc_id, vec_rnk FROM (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS vec_rnk
          FROM sims)
        WHERE vec_rnk <= ${VectorQueries.IvfTopK}),
      fused AS (
        SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id, kw.kw_rnk, vec.vec_rnk,
               CAST(COALESCE(CAST(round(1.0 / ($RrfK + kw.kw_rnk), 6) AS DECIMAL(38,6)),
                             CAST(0 AS DECIMAL(38,6)))
                  + COALESCE(CAST(round(1.0 / ($RrfK + vec.vec_rnk), 6) AS DECIMAL(38,6)),
                             CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS rrf
        FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, kw_rnk, vec_rnk, rrf
      FROM fused
      ORDER BY rnk
    """))

  /** Hybrid retrieval over the PERSISTED serving indexes: the keyword
    * list from the saved postings layout (`bm25_serve` — exact by
    * construction, pushed `In(term,…)` scan) and the vector list from
    * the saved IVF index (`Ann.query`, nProbe = 3 — approximate,
    * recall@5 ≥ 3/5 per the `sim_ivf` gate), fused with the SAME
    * [[rrfFuse]]. Driver verification follows the `recallAnchored`
    * discipline: the hash anchor is the EXACT fused ranking (identical
    * to `hybrid_search`'s oracle rows), plus one `fuse_ok` boolean the
    * oracle asserts TRUE — at most 2 exact-fused docs missing from the
    * served fusion. That bound is IMPLIED by the member gates, not
    * tuned: the keyword lists are identical, so every doc the served
    * fusion misses must be an exact-vec-only doc, and vector recall
    * ≥ 3 of top-5 leaves at most 2 of those. */
  val hybridServe = GQuery(
    "hybrid_serve",
    (s, d) => {
      val kwServed = TextQueries.bm25Serve.fn(s, d)
        .select(col("doc_id"), col("rnk").as("kw_rnk"))
      val vecServed = Ann.query(
        Ann.load(s, VectorQueries.savedIvfPath(s, d, k = 8)),
        probeId = 0, topK = VectorQueries.IvfTopK, nProbe = 3)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("vec_rnk"))
      // served fusion is ≤ 15 rows by construction — broadcastable
      val servedIds = rrfFuse(kwServed, vecServed)
        .select(col("doc_id"), lit(1L).as("hit"))
      rrfFuse(kwExact(s, d), vecExact(s, d))
        .join(broadcast(servedIds), Seq("doc_id"), "left")
        .select(col("rnk"), col("doc_id"), col("kw_rnk"), col("vec_rnk"),
          col("rrf"),
          (sum(when(col("hit").isNull, lit(1L)).otherwise(lit(0L)))
            .over(Window.partitionBy()) <= 2).as("fuse_ok"))
        .orderBy("rnk")
    },
    // hybrid_search's oracle with the tolerance boolean asserted TRUE:
    // the served fusion must cover all but ≤2 of the exact fused docs
    Some(s"""
      WITH docs AS (
        SELECT doc_id, str_split(text, ' ') AS toks,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
        FROM documents WHERE text IS NOT NULL),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
        FROM docs),
      tf AS (
        SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs)
        WHERE term IN ('spark', 'merge', 'filter')
        GROUP BY 1, 2, 3),
      dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
               CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl))),
                 4) AS DECIMAL(38,4)) AS score_term
        FROM tf JOIN dfs d USING (term) CROSS JOIN stats s),
      kwagg AS (
        SELECT doc_id, CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1),
      kw AS (
        SELECT doc_id, kw_rnk FROM (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS kw_rnk
          FROM kwagg)
        WHERE kw_rnk <= $KwTopK),
      probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0),
      vec AS (
        SELECT doc_id, vec_rnk FROM (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS vec_rnk
          FROM sims)
        WHERE vec_rnk <= ${VectorQueries.IvfTopK}),
      fused AS (
        SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id, kw.kw_rnk, vec.vec_rnk,
               CAST(COALESCE(CAST(round(1.0 / ($RrfK + kw.kw_rnk), 6) AS DECIMAL(38,6)),
                             CAST(0 AS DECIMAL(38,6)))
                  + COALESCE(CAST(round(1.0 / ($RrfK + vec.vec_rnk), 6) AS DECIMAL(38,6)),
                             CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS rrf
        FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, kw_rnk, vec_rnk, rrf, TRUE AS fuse_ok
      FROM fused
      ORDER BY rnk
    """))

  val all: Seq[GQuery] = Seq(hybridSearch, hybridServe)
}
