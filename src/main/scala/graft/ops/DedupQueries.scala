package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 X2 at scale: MinHash + LSH banding and SimHash near-dup — the
  * LLM-corpus dedup path (shingle → minhash → band → bucket-join).
  *
  * The MinHash permutation family is md5-based (`md5(seed || ':' || tok)`)
  * rather than the usual random-affine family so the DuckDB oracle can
  * compute the *identical* signatures — the full pipeline (signatures,
  * banding, bucket join, candidate pairs) is hash-verified, not just
  * row-counted. md5-as-permutation is public folklore (a hash function is
  * a fixed random permutation of its input space for dedup purposes).
  *
  * Scale shape: tokenize→explode→min-groupBy is map-side combinable;
  * banding turns the quadratic all-pairs problem into an equi-join on
  * (band_idx, band_key) — the only shuffle keys. No cross join anywhere.
  * SimHash uses xxhash64 (Spark-builtin, codegen'd) — no DuckDB
  * equivalent, so its query is rows-only checked.
  */
object DedupQueries {

  /** Registry default widths: 8 hashes in 4 bands × 2 rows. The oracle
    * SQL below is written against these, so the `queries()` entries pin
    * them; every public function takes the widths as parameters for
    * corpus-sized tuning. Width math (standard LSH S-curve): a pair with
    * Jaccard s becomes a candidate with P = 1 − (1 − s^r)^b for b bands
    * of r rows. Growing b (more hashes, same r) raises recall; growing r
    * sharpens the threshold t ≈ (1/b)^(1/r) and CUTS candidate volume —
    * at 100 TB corpora run wider (e.g. 128 hashes, 16 bands × 8 rows) so
    * per-bucket populations, and hence the O(Σ bucket²) candidate join,
    * stay bounded as N grows. `LshWidthSpec` measures the effect. */
  val DefaultNumHashes = 8
  val DefaultBandRows = 2

  /** doc_id → distinct-token rows, the shingle base. */
  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** MinHash signature matrix: one min-md5 per permutation seed. */
  def minhashSignatures(docs: DataFrame,
      numHashes: Int = DefaultNumHashes): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(i.toString), lit(":"), col("tok")))).as(s"sig_$i"))
    docTokens(docs).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: band key = md5 over the band's signature rows. Output is
    * one row per (doc, band). */
  def minhashBands(sigs: DataFrame, numHashes: Int = DefaultNumHashes,
      bandRows: Int = DefaultBandRows): DataFrame = {
    require(numHashes % bandRows == 0,
      s"numHashes=$numHashes must divide into bands of bandRows=$bandRows")
    val bands = (0 until numHashes / bandRows).map { b =>
      val cols = (0 until bandRows).map(r => col(s"sig_${b * bandRows + r}"))
      struct(lit(b).as("band_idx"), md5(concat(cols: _*)).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
        col("band.band_key").as("band_key"))
  }

  /** Candidate pairs: docs sharing any band bucket (equi-join, distinct). */
  def minhashCandidates(docs: DataFrame,
      numHashes: Int = DefaultNumHashes,
      bandRows: Int = DefaultBandRows): DataFrame = {
    val bands = minhashBands(minhashSignatures(docs, numHashes),
      numHashes, bandRows)
    val a = bands.select(col("band_idx"), col("band_key"),
      col("doc_id").as("ida"))
    val b = bands.select(col("band_idx"), col("band_key"),
      col("doc_id").as("idb"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
  }

  /** X2 minhash signatures, oracle-verified end-to-end. */
  val dedupMinhashSig = GQuery(
    "dedup_minhash_sig",
    (s, d) =>
      minhashSignatures(Tables.documents(s, d).filter(col("doc_id") < 100))
        .select(col("doc_id"), col("sig_0"), col("sig_1"), col("sig_7"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             MIN(md5('0:' || tok)) AS sig_0,
             MIN(md5('1:' || tok)) AS sig_1,
             MIN(md5('7:' || tok)) AS sig_7
      FROM (SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < 100)
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** X2 LSH candidate pairs from band buckets, oracle-verified. */
  val dedupMinhashLsh = GQuery(
    "dedup_minhash_lsh",
    (s, d) =>
      minhashCandidates(Tables.documents(s, d).filter(col("doc_id") < 100))
        .orderBy("ida", "idb"),
    Some("""
      WITH dtoks AS (
        SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 100),
      sigs AS (
        SELECT doc_id,
               MIN(md5('0:' || tok)) AS s0, MIN(md5('1:' || tok)) AS s1,
               MIN(md5('2:' || tok)) AS s2, MIN(md5('3:' || tok)) AS s3,
               MIN(md5('4:' || tok)) AS s4, MIN(md5('5:' || tok)) AS s5,
               MIN(md5('6:' || tok)) AS s6, MIN(md5('7:' || tok)) AS s7
        FROM dtoks GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band_idx, md5(s0 || s1) AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1, md5(s2 || s3) FROM sigs
        UNION ALL SELECT doc_id, 2, md5(s4 || s5) FROM sigs
        UNION ALL SELECT doc_id, 3, md5(s6 || s7) FROM sigs)
      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
      ORDER BY ida, idb
    """))

  /** SimHash: 64-bit signature from per-token xxhash64 bit votes. */
  def simhash(tokens: Column): Column = {
    val bits = (0 until 64).map { b =>
      // vote for bit b: +1 if set, -1 if clear, summed over tokens
      val vote = aggregate(tokens,
        lit(0L),
        (acc, t) => acc +
          when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** SimHash signatures + bucket prefix (rows-only: xxhash64 has no
    * DuckDB twin; determinism is still exercised cross-run). Uses the
    * native one-pass `SimHash64` expression — SimHashSpec pins it equal
    * to the 64-aggregate `simhash` composition kept above. */
  val dedupSimhash = GQuery(
    "dedup_simhash",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          graft.functions.SimHash64.simhash64(
            array_distinct(split(col("text"), " "))).as("simhash"))
        .withColumn("bucket", shiftright(col("simhash"), 48))
        .orderBy("doc_id"),
    None)

  /** Shuffle-free MinHash: the signature computed per-row with
    * higher-order array expressions (`array_min` over `transform`) —
    * identical values to `minhashSignatures` but with NO explode and NO
    * groupBy shuffle. At 100 TB this is the form that matters: signature
    * computation becomes a narrow map fused into the scan; only the tiny
    * (doc → band-key) frame ever shuffles, in the banding join. */
  def minhashSignaturesFast(docs: DataFrame,
      numHashes: Int = DefaultNumHashes): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    val sigs = (0 until numHashes).map(i =>
      array_min(transform(toks,
        t => md5(concat(lit(i.toString), lit(":"), t)))).as(s"sig_$i"))
    docs.select(col("doc_id") +: sigs: _*)
  }

  /** Same oracle as dedup_minhash_sig — proves the shuffle-free plan
    * computes identical signatures. */
  val dedupMinhashFast = GQuery(
    "dedup_minhash_fast",
    (s, d) =>
      minhashSignaturesFast(Tables.documents(s, d).filter(col("doc_id") < 100))
        .select(col("doc_id"), col("sig_0"), col("sig_1"), col("sig_7"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             list_aggregate(list_transform(list_distinct(str_split(text, ' ')), t -> md5('0:' || t)), 'min') AS sig_0,
             list_aggregate(list_transform(list_distinct(str_split(text, ' ')), t -> md5('1:' || t)), 'min') AS sig_1,
             list_aggregate(list_transform(list_distinct(str_split(text, ' ')), t -> md5('7:' || t)), 'min') AS sig_7
      FROM documents WHERE doc_id < 100
      ORDER BY doc_id
    """))

  /** End-to-end MinHash dedup: LSH candidates → exact-Jaccard verify
    * (≥ 0.5) → least-id survivor per doc. This is the full LLM-corpus
    * near-dup pipeline in one query — candidate generation by band
    * equi-join (never all-pairs), verification only on candidates, and a
    * deterministic keeper. The Jaccard value is a single division of
    * exact small integers, so Spark and DuckDB produce bit-identical
    * doubles and the ≥ τ cut can't diverge even on exact ties. */
  val dedupMinhashVerify = GQuery(
    "dedup_minhash_verify",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
      val toksOf = docs.select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      val inter = size(array_intersect(col("ta"), col("tb")))
      val verified = minhashCandidates(docs)
        .join(toksOf.select(col("doc_id").as("ida"), col("toks").as("ta")),
          "ida")
        .join(toksOf.select(col("doc_id").as("idb"), col("toks").as("tb")),
          "idb")
        .filter((inter.cast(DoubleType) /
          (size(col("ta")) + size(col("tb")) - inter)) >= 0.5)
        .groupBy(col("idb"))
        .agg(min(col("ida")).as("keeper_min"))
      docs.select(col("doc_id"))
        .join(verified, col("doc_id") === col("idb"), "left")
        .select(col("doc_id"),
          coalesce(col("keeper_min"), col("doc_id")).as("keeper"))
        .orderBy("doc_id")
    },
    Some("""
      WITH dtoks AS (
        SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 100),
      sigs AS (
        SELECT doc_id,
               MIN(md5('0:' || tok)) AS s0, MIN(md5('1:' || tok)) AS s1,
               MIN(md5('2:' || tok)) AS s2, MIN(md5('3:' || tok)) AS s3,
               MIN(md5('4:' || tok)) AS s4, MIN(md5('5:' || tok)) AS s5,
               MIN(md5('6:' || tok)) AS s6, MIN(md5('7:' || tok)) AS s7
        FROM dtoks GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band_idx, md5(s0 || s1) AS band_key FROM sigs
        UNION ALL SELECT doc_id, 1, md5(s2 || s3) FROM sigs
        UNION ALL SELECT doc_id, 2, md5(s4 || s5) FROM sigs
        UNION ALL SELECT doc_id, 3, md5(s6 || s7) FROM sigs),
      cand AS (
        SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id),
      tsets AS (
        SELECT doc_id, list_distinct(str_split(text, ' ')) AS toks
        FROM documents WHERE doc_id < 100),
      ver AS (
        SELECT idb, MIN(ida) AS keeper_min
        FROM cand
        JOIN tsets ta ON ta.doc_id = ida
        JOIN tsets tb ON tb.doc_id = idb
        WHERE CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) /
              (len(ta.toks) + len(tb.toks)
               - len(list_intersect(ta.toks, tb.toks))) >= 0.5
        GROUP BY 1)
      SELECT d.doc_id, CAST(COALESCE(v.keeper_min, d.doc_id) AS BIGINT) AS keeper
      FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
      LEFT JOIN ver v ON v.idb = d.doc_id
      ORDER BY doc_id
    """))

  def all: Seq[GQuery] =
    Seq(dedupMinhashSig, dedupMinhashLsh, dedupSimhash, dedupMinhashFast,
      dedupMinhashVerify)
}
