package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** §2.10 X3 + similarity-search extension over `embeddings`
  * (list<float>, dim=64).
  *
  * Dot products / norms are pure higher-order array expressions
  * (`aggregate` over `zip_with`) — no UDFs, stays inside codegen. Floats
  * are cast to double element-wise before multiply/accumulate so both
  * engines fold identical doubles in identical order; emitted similarity
  * values are rounded into decimals to absorb any last-ulp divergence.
  *
  * Scale path: brute-force top-k is O(N·k) per probe — fine for one probe
  * vector; for all-pairs at 100 TB the LSH-bucketed variant
  * (`simBucketed` below) does candidate generation on a coarse signature
  * first, turning the cross join into a bucket-equi-join.
  */
object VectorQueries {

  /** Squared norm / dot product: the native fused-loop expressions
    * (`graft.functions.VecMath`), bit-identical to the HOF composition
    * `aggregate(zip_with(a,b,_*_),0d,_+_)` they replaced (same widening,
    * same left-to-right IEEE order — pinned in VecMathSpec), so every
    * oracle below is unchanged; they just skip the per-row intermediate
    * product array the HOF form materializes. */
  private def sumSq(c: Column): Column =
    graft.functions.VecMath.vecNormSq(c)

  private def dot(a: Column, b: Column): Column =
    graft.functions.VecMath.vecDot(a, b)

  /** F10/X3 vector norms + dimensionality audit per label. */
  val vecNorm = GQuery(
    "vec_norm",
    (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          size(col("embedding")).cast(LongType).as("dim"),
          round(sqrt(sumSq(col("embedding"))), 3)
            .cast(DecimalType(38, 3)).cast(DoubleType).as("l2_norm"))
        .orderBy("vec_id"),
    Some("""
      SELECT vec_id, label,
             CAST(len(embedding) AS BIGINT) AS dim,
             CAST(CAST(round(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 3) AS DECIMAL(38,3)) AS DOUBLE) AS l2_norm
      FROM embeddings
      ORDER BY vec_id
    """))

  /** Brute-force cosine top-`topK` neighbors of vec_id 0 as
    * (rnk, neighbor_id) — the ONE implementation of the exact form,
    * shared by `sim_topk` and the IVF entries' hash anchor so a
    * tie-break or rounding change can never diverge them. The probe
    * vector is collected once (one tiny lookup job) and inlined as a
    * LITERAL array with its norm pre-folded on the driver in the same
    * left-to-right order the executor-side `aggregate` uses —
    * bit-identical doubles, but the scan needs no broadcast join stage.
    * Top-K goes through orderBy+limit (TakeOrderedAndProject:
    * per-partition heaps, no shuffle) instead of a single-partition
    * global window. Output carries only integer ids/ranks so the hash
    * can never wobble on float ulps. */
  private[ops] def bruteTopK(s: org.apache.spark.sql.SparkSession, d: String,
      topK: Int,
      extraFilter: Option[org.apache.spark.sql.Column] = None)
      : org.apache.spark.sql.DataFrame =
    bruteTopKOf(Tables.embeddings(s, d), topK, extraFilter,
      knownProbe = Some(probeEmbedding(s, d)))

  /** [[bruteTopK]] over an explicit corpus frame — the anchor for
    * entries whose ground truth is NOT the raw embeddings table (the
    * update roundtrip anchors on the post-update corpus). */
  /** Probe embeddings fetched once per process — the probe is the
    * REQUEST side of every brute/serve entry (a fixed query vector, not
    * corpus state): the lookup job that materializes it from the
    * embeddings table is test scaffolding, so it follows the [[embCount]]
    * once-per-process discipline instead of paying one probe-row scan
    * per timed rep. Keyed by (sfDir, vec_id); the underlying testdata
    * table is immutable, so the entry can never go stale. */
  private val probeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Seq[Double]]

  private[ops] def probeEmbedding(s: org.apache.spark.sql.SparkSession,
      d: String, id: Long = 0L): Seq[Double] =
    graft.BuildOnce.memo(probeCache, (d, id))(
      Tables.embeddings(s, d).filter(col("vec_id") === id)
        .select(transform(col("embedding"), _.cast(DoubleType)))
        .head().getSeq[Double](0).toSeq)

  private[ops] def bruteTopKOf(e: org.apache.spark.sql.DataFrame,
      topK: Int,
      extraFilter: Option[org.apache.spark.sql.Column] = None,
      knownProbe: Option[Seq[Double]] = None)
      : org.apache.spark.sql.DataFrame = {
    val probe: Seq[Double] = knownProbe.getOrElse(
      e.filter(col("vec_id") === 0)
        .select(transform(col("embedding"), _.cast(DoubleType)))
        .head().getSeq[Double](0).toSeq)
    val pnorm = math.sqrt(probe.foldLeft(0.0)((acc, x) => acc + x * x))
    val litProbe = array(probe.map(lit): _*)
    extraFilter.foldLeft(e.filter(col("vec_id") =!= 0))(
        (df, p) => df.filter(p))
      .select(col("vec_id").as("neighbor_id"),
        (dot(col("embedding"), litProbe) /
          (sqrt(sumSq(col("embedding"))) * lit(pnorm))).as("sim"))
      .orderBy(col("sim").desc, col("neighbor_id"))
      .limit(topK)
      .select(row_number().over(
        Window.orderBy(col("sim").desc, col("neighbor_id")))
        .cast(LongType).as("rnk"),
        col("neighbor_id"))
  }

  /** X3 brute-force cosine top-k: 5 nearest neighbors of vec_id 0 via
    * [[bruteTopK]]. */
  val simTopk = GQuery(
    "sim_topk",
    (s, d) => Out.boundedSort(bruteTopK(s, d, topK = 5), col("rnk")),
    Some("""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0)
      SELECT rnk, neighbor_id
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= 5
      ORDER BY rnk
    """))

  /** Registry default sign-LSH width. The oracle SQL is written against
    * 8 bits (256 buckets), so the `queries()` entries pin it; callers
    * size `bits` to the corpus instead. Within-bucket pairing is
    * O(Σ bucket²), so buckets must stay bounded as N grows: pick
    * bits ≈ log2(N / targetBucketSize) — e.g. 10^9 vectors at ~4k per
    * bucket → 18 bits. `LshWidthSpec` measures candidate-count vs width. */
  val DefaultSignBits = 8

  /** Corpus-sized sign-LSH width: bits ≈ log2(N / targetBucket), clamped.
    * Within-bucket pairing costs O(Σ bucket²), so expected bucket
    * population N / 2^bits must stay ≈ targetBucket as N grows — this
    * chooser closes the loop on the sizing rule the width sweep
    * (`LshWidthSpec`) measures, so a caller scaling up the corpus picks
    * up the wider signature automatically instead of shipping the pinned
    * 8-bit registry default to a billion-vector corpus. maxBits caps at
    * the embedding dim (only `bits` leading components exist to sign). */
  def signBitsFor(corpusSize: Long, targetBucket: Long = 1024,
      minBits: Int = 4, maxBits: Int = 24): Int = {
    require(corpusSize > 0 && targetBucket > 0,
      s"signBitsFor: corpusSize=$corpusSize targetBucket=$targetBucket " +
        "must be positive")
    val raw = math.ceil(
      math.log(corpusSize.toDouble / targetBucket) / math.log(2)).toInt
    math.max(minBits, math.min(maxBits, raw))
  }

  /** Sign-LSH signature: sign pattern of the first `bits` components (a
    * fixed, deterministic hyperplane set — axis-aligned hyperplanes are
    * valid sign-LSH because embedding components are uncorrelated; a
    * random-projection matrix would slot in here for correlated data).
    * Shared by the bucket-stats query and the embedding-dedup candidate
    * join. */
  def signBucket(emb: Column, bits: Int = DefaultSignBits): Column =
    array_join(
      transform(slice(emb, 1, bits),
        x => when(x >= 0f, lit("1")).otherwise(lit("0"))),
      "")

  /** Scale path for all-pairs similarity: sign-LSH bucketing; same-bucket
    * pairs are the candidates. Emits bucket population stats —
    * candidate-set sizing is the tuning metric for IVF/LSH at 100 TB. */
  val simBucketed = GQuery(
    "sim_buckets",
    (s, d) => {
      Tables.embeddings(s, d)
        .select(signBucket(col("embedding")).as("bucket"), col("vec_id"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_vecs"),
          min(col("vec_id")).as("min_vec"))
        .transform(Out.boundedSort(_, col("bucket")))
    },
    Some("""
      SELECT array_to_string(list_transform(embedding[1:8],
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
             COUNT(*) AS n_vecs, CAST(MIN(vec_id) AS BIGINT) AS min_vec
      FROM embeddings
      GROUP BY 1
      ORDER BY bucket
    """))

  /** Pairwise cosine within one small label group — the verification-scale
    * exact form of near-dup-by-embedding. Ids only, same rationale as
    * simTopk. */
  val simPairs = GQuery(
    "sim_pairs",
    (s, d) => {
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 40)
        .select(col("vec_id"), col("embedding"))
      val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
      a.join(b, col("ida") < col("idb"))
        .select(col("ida"), col("idb"),
          (dot(col("ea"), col("eb")) /
            (sqrt(sumSq(col("ea"))) * sqrt(sumSq(col("eb"))))).as("sim"))
        .filter(col("sim") > 0.2)
        .select("ida", "idb")
        .orderBy("ida", "idb")
    },
    Some("""
      SELECT a.vec_id AS ida, b.vec_id AS idb
      FROM embeddings a JOIN embeddings b
        ON a.vec_id < b.vec_id AND a.vec_id < 40 AND b.vec_id < 40
      WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.2
      ORDER BY ida, idb
    """))

  /** Embedding-cosine near-dup — the vector member of the dedup family
    * (exact / MinHash / SimHash / Jaccard / embedding). Candidate pairs
    * come from the sign-LSH bucket equi-join (never an all-pairs cross
    * join — the 100 TB shape), are verified with exact cosine ≥ τ, and
    * each vector's survivor is the least id among itself and its nearer-
    * to-zero neighbors. One-pass pointer dedup: full transitive closure
    * would iterate this to a fixpoint (connected components); the single
    * pass is deterministic and oracle-expressible, which is what the
    * correctness gate needs. τ=0.4 sits ≥2.5e-4 from every observed pair
    * similarity at all SFs, so float-vs-double rounding can't flip it. */
  val dedupEmbed = GQuery(
    "dedup_embed",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          signBucket(col("embedding")).as("bucket"))
      val a = e.select(col("bucket"), col("vec_id").as("ida"),
        col("embedding").as("ea"))
      val b = e.select(col("bucket"), col("vec_id").as("idb"),
        col("embedding").as("eb"))
      val near = a.join(b, "bucket")
        .filter(col("ida") < col("idb"))
        .filter((dot(col("ea"), col("eb")) /
          (sqrt(sumSq(col("ea"))) * sqrt(sumSq(col("eb"))))) >= 0.4)
        .groupBy(col("idb"))
        .agg(min(col("ida")).as("keeper_min"))
      e.join(near, e("vec_id") === near("idb"), "left")
        .select(col("vec_id"),
          coalesce(col("keeper_min"), col("vec_id")).as("keeper"))
        .orderBy("vec_id")
    },
    Some("""
      WITH e AS (
        SELECT vec_id, embedding,
               array_to_string(list_transform(embedding[1:8],
                 x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
        FROM embeddings),
      near AS (
        SELECT b.vec_id AS idb, MIN(a.vec_id) AS keeper_min
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        GROUP BY 1)
      SELECT e.vec_id, CAST(COALESCE(n.keeper_min, e.vec_id) AS BIGINT) AS keeper
      FROM e LEFT JOIN near n ON n.idb = e.vec_id
      ORDER BY vec_id
    """))

  /** Transitive-closure form of `dedup_embed`: the same verified edge
    * set (sign-LSH bucket candidates → exact cosine ≥ 0.4) collapsed
    * into connected components via `Components.connected`, keeper =
    * cluster-min over the FULL closure — a chain a~b~c where a~c never
    * shared a bucket still collapses to one survivor, which the
    * one-pass keeper pointer above cannot do. Same distributed fixpoint
    * as `dedup_cluster` (O(log diameter) rounds of linear equi-joins);
    * the DuckDB oracle enumerates recursive reachability over the
    * identical edges, so equal output proves the loop loses nothing. */
  val dedupEmbedCluster = GQuery(
    "dedup_embed_cluster",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          signBucket(col("embedding")).as("bucket"))
      val a = e.select(col("bucket"), col("vec_id").as("ida"),
        col("embedding").as("ea"))
      val b = e.select(col("bucket"), col("vec_id").as("idb"),
        col("embedding").as("eb"))
      val edges = a.join(b, "bucket")
        .filter(col("ida") < col("idb"))
        .filter((dot(col("ea"), col("eb")) /
          (sqrt(sumSq(col("ea"))) * sqrt(sumSq(col("eb"))))) >= 0.4)
        .select(col("ida"), col("idb"))
      Components.connected(e.select(col("vec_id")), edges)
        .select(col("id").as("vec_id"), col("component").as("keeper"))
        .orderBy("vec_id")
    },
    Some("""
      WITH RECURSIVE e AS (
        SELECT vec_id, embedding,
               array_to_string(list_transform(embedding[1:8],
                 x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
        FROM embeddings),
      edges AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb
        FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
      esym AS (
        SELECT ida AS src, idb AS dst FROM edges
        UNION ALL
        SELECT idb AS src, ida AS dst FROM edges),
      reach(id, r) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT es.dst, reach.r
        FROM reach JOIN esym es ON es.src = reach.id)
      SELECT id AS vec_id, CAST(MIN(r) AS BIGINT) AS keeper
      FROM reach
      GROUP BY id
      ORDER BY vec_id
    """))

  /** Shared output shape for the two IVF registry entries: the DRIVER-
    * VERIFIABLE brute-force top-`topK` of vec_id 0 (exactly `sim_topk`'s
    * hash-stable id/rank form — DuckDB recomputes it with
    * list_cosine_similarity) plus a `recall_ok` TOLERANCE BOOLEAN: the
    * IVF probe's top-`topK` must hit ≥ `minHits` of the brute-force set
    * (recall@5 ≥ 0.6, the `AnnSkewSpec` pin promoted into the driver
    * gate — the oracle asserts the boolean TRUE). The recall flag is a
    * windowed sum over the ≤topK joined rows (bounded single partition
    * by construction), so the corpus-scanning brute top-K evaluates
    * exactly ONCE per invocation. */
  private def recallAnchored(s: org.apache.spark.sql.SparkSession, d: String,
      approxTop: org.apache.spark.sql.DataFrame, topK: Int,
      minHits: Int,
      extraFilter: Option[org.apache.spark.sql.Column] = None)
      : org.apache.spark.sql.DataFrame =
    recallAnchoredOf(bruteTopK(s, d, topK, extraFilter), approxTop,
      minHits)

  /** [[recallAnchored]] against a caller-supplied brute anchor (see
    * [[bruteTopKOf]]). */
  private def recallAnchoredOf(brute: org.apache.spark.sql.DataFrame,
      approxTop: org.apache.spark.sql.DataFrame, minHits: Int)
      : org.apache.spark.sql.DataFrame = {
    val hits = approxTop.select(col("neighbor_id"), lit(1L).as("hit"))
    brute.join(broadcast(hits), Seq("neighbor_id"), "left")
      .select(col("rnk"), col("neighbor_id"),
        (sum(coalesce(col("hit"), lit(0L)))
          .over(Window.partitionBy()) >= minHits).as("recall_ok"))
      .transform(Out.boundedSort(_, col("rnk")))
  }

  private def ivfWithRecall(s: org.apache.spark.sql.SparkSession, d: String,
      index: Ann.IvfIndex, topK: Int = IvfTopK, nProbe: Int = 3,
      minHits: Int = 3): org.apache.spark.sql.DataFrame =
    recallAnchored(s, d,
      Ann.query(index, probeId = 0, topK = topK, nProbe = nProbe,
        knownProbe = Some(probeEmbedding(s, d))),
      topK, minHits)

  /** topK shared by [[ivfWithRecall]] and [[ivfRecallOracle]] so the
    * Spark form and its DuckDB twin can't drift apart on row count. */
  private[ops] val IvfTopK = 5

  /** DuckDB twin of [[ivfWithRecall]] at the same `topK`: the same
    * brute-force top-K (the hash anchor) with the recall boolean
    * asserted TRUE. */
  private val ivfRecallOracle = s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0)
      SELECT rnk, neighbor_id, TRUE AS recall_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """

  /** X3 scale path, driver-visible: IVF search (8 cells, probe 3) for
    * the neighbors of vec_id 0, emitted with the brute-force top-5 and a
    * `recall_ok` ≥ 0.6 boolean so the driver's oracle verifies the probe
    * (see [[ivfWithRecall]]). Builds the index per invocation — this
    * entry IS the build-path timing; `sim_ivf_loaded` below is the
    * serving-path timing. `AnnSkewSpec` pins full-probe == brute-force. */
  val simIvf = GQuery(
    "sim_ivf",
    (s, d) => ivfWithRecall(s, d, Ann.build(Tables.embeddings(s, d), k = 8)),
    Some(ivfRecallOracle))

  /** Saved-index path per (sfDir, k), built at most once per process —
    * the bench reps (and any spec reuse) then measure the SERVING path
    * (load + partition-pruned probe), which is the claim `sim_ivf_loaded`
    * exists to demonstrate; `sim_ivf` above keeps paying the build per
    * invocation so the build path stays timed. Lives under the
    * per-process scratch dir ([[graft.GraftSession.scratchDir]]), so
    * concurrent graft processes can't race and shutdown reaping removes
    * it. */
  private val ivfSaved =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  private[ops] def savedIvfPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): String =
    graft.BuildOnce.memo(ivfSaved, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      Ann.save(Ann.build(Tables.embeddings(s, d), k = k), path)
      path
    }

  /** The persisted-IVF serving path, driver-visible end-to-end: build →
    * `Ann.save` (inverted lists as cell partition directories, ONCE per
    * process via [[savedIvfPath]]) → `Ann.load` → query. On the LOADED
    * index the nProbe cell restriction is partition pruning against the
    * parquet layout — at 100 TB a probe reads nProbe/k of the corpus no
    * matter how large it grows, which is the whole point of persisting
    * the index rather than rebuilding per query (what `sim_ivf` above
    * does). Same driver-verified recall output as `sim_ivf`
    * ([[ivfWithRecall]]); `AnnSkewSpec` pins that the loaded-index probe
    * plan reads ONLY the probed cell directories and that full probing
    * equals brute force. */
  val simIvfLoaded = GQuery(
    "sim_ivf_loaded",
    (s, d) => ivfWithRecall(s, d, Ann.load(s, savedIvfPath(s, d, k = 8))),
    Some(ivfRecallOracle))

  /** Query-time FILTERED search on the persisted index — the vector
    * store "metadata filter" (retrieve the top-k among rows matching a
    * payload predicate, here id-parity standing in for a payload
    * column). The predicate applies to CANDIDATES after cell pruning
    * and before ranking ([[Ann.query]]'s `candidateFilter`), so the
    * result is the k best matching vectors — not the matching subset of
    * the unfiltered top-k, which is the classic filtered-search bug
    * (post-filtering can return < k rows and misses matches outside the
    * unfiltered shortlist). Anchored against the FILTERED brute-force
    * top-5 with the usual recall tolerance; `AnnFilteredSpec` pins
    * exactness under full probing and the candidate-set semantics. */
  val simFiltered = GQuery(
    "sim_filtered",
    (s, d) => {
      val pred = pmod(col("vec_id"), lit(3)) === 0
      recallAnchored(s, d,
        Ann.query(Ann.load(s, savedIvfPath(s, d, k = 8)),
          probeId = 0, topK = IvfTopK, nProbe = 3,
          candidateFilter = Some(pred),
          knownProbe = Some(probeEmbedding(s, d))),
        IvfTopK, minHits = 3, extraFilter = Some(pred))
    },
    Some(s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0 AND e.vec_id % 3 = 0)
      SELECT rnk, neighbor_id, TRUE AS recall_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """))

  /** Grow-by-append path per (sfDir, k), built at most once per
    * process: the index is TRAINED AND SAVED on only the even-id half
    * of the corpus, then the odd-id half arrives later via
    * `Ann.append` — frozen-centroid assignment, append-mode write into
    * the same cell directories, never touching the existing lists. */
  private val ivfAppended =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  private[ops] def appendedIvfPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): String =
    graft.BuildOnce.memo(ivfAppended, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_app_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      val e = Tables.embeddings(s, d)
      Ann.save(Ann.build(e.filter(pmod(col("vec_id"), lit(2)) === 0),
        k = k), path)
      Ann.append(s, path, e.filter(pmod(col("vec_id"), lit(2)) === 1))
      path
    }

  /** Incremental index maintenance, driver-visible end-to-end: the
    * persisted IVF index is built on HALF the corpus, the other half is
    * `Ann.append`ed against the frozen centroids (ONCE per process via
    * [[appendedIvfPath]]), and the probe then searches the merged
    * layout — same partition pruning, same recall gate as `sim_ivf`,
    * except the index was never rebuilt. This is the operational 100 TB
    * loop (continuous corpus growth between retrains); AnnAppendSpec
    * pins append ≡ one-pass assignment with the same centroids and that
    * no new cell directories appear. */
  val simIvfAppend = GQuery(
    "sim_ivf_append",
    (s, d) => ivfWithRecall(s, d,
      Ann.load(s, appendedIvfPath(s, d, k = 8))),
    Some(ivfRecallOracle))

  /** Epoch-layout grow path, built once per process: build on the
    * even-id half as epoch 0, append the odd half as a referenced
    * delta generation (epoch 1) — [[appendedIvfPath]]'s lifecycle on
    * the MANIFEST-POINTER layout ([[EpochAnn]]), where the append was
    * one atomic manifest flip a concurrent reader could overlap
    * safely. */
  private val ivfEpochSaved =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  private[ops] def epochIvfPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): String =
    graft.BuildOnce.memo(ivfEpochSaved, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_epoch_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      val e = Tables.embeddings(s, d)
      EpochAnn.build(s, e.filter(pmod(col("vec_id"), lit(2)) === 0),
        path, k = k)
      EpochAnn.append(s, e.filter(pmod(col("vec_id"), lit(2)) === 1),
        path, batchId = 1L)
      path
    }

  /** The SNAPSHOT-ISOLATED vector serving face, driver-verified: the
    * IVF index lives on epoch manifests ([[EpochAnn]] — every
    * mutation publishes new generation dirs behind one atomic manifest
    * rename, so centroids and lists can never be read mixed-
    * generation), grown half→full by a referenced delta append, then
    * probed through the SAME [[Ann.query]] path and recall gate as
    * `sim_ivf_append` — the layout change must be invisible in the
    * served answer. `EpochAnnSpec` pins the pinned-manifest isolation
    * across a concurrent retrain and the lifecycle ≡ rebuild. */
  val simIvfEpoch = GQuery(
    "sim_ivf_epoch",
    (s, d) => ivfWithRecall(s, d,
      EpochAnn.load(s, epochIvfPath(s, d, k = 8))),
    Some(ivfRecallOracle))

  /** Epoch-layout grow path for the COMPRESSED index, built once per
    * process — [[epochIvfPath]]'s lifecycle on [[EpochIvfpq]]: both
    * quantizers train on the even-id half (epoch 0), the odd half
    * appends as a referenced delta generation encoded under the PINNED
    * frozen quantizers (epoch 1). */
  private val ivfpqEpochSaved =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  private[ops] def epochIvfpqPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int, m: Int): String =
    graft.BuildOnce.memo(ivfpqEpochSaved, (d, k, m)) {
      val path = s"${graft.GraftSession.scratchDir}/ivfpq_epoch_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k${k}_m$m"
      val e = Tables.embeddings(s, d)
      EpochIvfpq.build(s, e.filter(pmod(col("vec_id"), lit(2)) === 0),
        path, k = k, m = m, codes = 16)
      EpochIvfpq.append(s, e.filter(pmod(col("vec_id"), lit(2)) === 1),
        path, batchId = 1L)
      path
    }

  /** The snapshot-isolated COMPRESSED serving face, driver-verified:
    * the IVF-PQ index lives on epoch manifests ([[EpochIvfpq]]), where
    * a retrain's three-directory swap (encoded, centroids, books — the
    * swap layout's sharpest seam: mixed generations there decode codes
    * through the WRONG codebooks) is one atomic manifest rename. Grown
    * half→full by a frozen-quantizer delta append, then probed through
    * the SAME [[Ivfpq.search]] two-phase path and recall gate as
    * `sim_ivfpq_append` — the layout change must be invisible in the
    * served answer. `EpochIvfpqSpec` pins the coherent-triple snapshot
    * across a concurrent retrain, ledger replays, the one-epoch
    * upsert, and lifecycle ≡ rebuild. */
  val simIvfpqEpoch = GQuery(
    "sim_ivfpq_epoch",
    (s, d) => recallAnchored(s, d,
      Ivfpq.search(EpochIvfpq.load(s, epochIvfpqPath(s, d, k = 8, m = 4)),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d)),
        knownProbe = Some(probeEmbedding(s, d))),
      topK = IvfTopK, minHits = 3),
    Some(ivfRecallOracle))

  /** Tombstoned-delete path per (sfDir, k), built at most once per
    * process: the full-corpus index is built and saved, then the
    * vec_id ≡ 2 (mod 5) residue class (~1/5 of the corpus) is
    * `Ann.delete`d — a bounded tombstone segment, the cell directories
    * untouched. */
  private val ivfDeleted =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  private def deletedIvfPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): String =
    graft.BuildOnce.memo(ivfDeleted, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_del_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      val e = Tables.embeddings(s, d)
      Ann.save(Ann.build(e, k = k), path)
      Ann.delete(s, path,
        e.where(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"))
      path
    }

  /** The DELETE leg of the ANN maintenance lifecycle, driver-verified
    * (`bm25_serve_delete`'s vector twin): the persisted IVF index had
    * ~1/5 of its residents tombstoned by `Ann.delete` — no rewrite of
    * the cell directories, just the bounded segment every `Ann.load`
    * anti-joins — and the probe then searches the survivors. Anchored
    * against the brute-force top-5 OVER THE SURVIVORS (cosine carries
    * no cross-document state, so tombstoned serving must equal
    * rebuild-over-survivors serving with these centroids — exactness
    * under full probing is pinned in `AnnDeleteSpec`), with the usual
    * recall ≥ 3/5 tolerance at nProbe = 3. A deleted id can never
    * surface: the anti-join removes it from every probed cell before
    * ranking, which is the takedown guarantee the reference only gets
    * by full reload. */
  val simIvfDelete = GQuery(
    "sim_ivf_delete",
    (s, d) => {
      val pred = pmod(col("vec_id"), lit(5)) =!= 2
      recallAnchored(s, d,
        Ann.query(Ann.load(s, deletedIvfPath(s, d, k = 8)),
          probeId = 0, topK = IvfTopK, nProbe = 3,
          knownProbe = Some(probeEmbedding(s, d))),
        IvfTopK, minHits = 3, extraFilter = Some(pred))
    },
    Some(s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0 AND e.vec_id % 5 <> 2)
      SELECT rnk, neighbor_id, TRUE AS recall_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """))

  /** Delete path aligned with the TEXT index's doomed set (doc_id ≡ 2
    * ... 3 mod 7 — the `savedPostingsDeletePath` residue), so the
    * composed hybrid entry can prove one takedown propagating through
    * BOTH tiers. Separate from [[deletedIvfPath]] (mod-5) so each
    * entry's oracle stays independently pinned. */
  private val ivfDeleted7 =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  private[ops] def deletedIvfPath7(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): String =
    graft.BuildOnce.memo(ivfDeleted7, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_del7_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      val e = Tables.embeddings(s, d)
      Ann.save(Ann.build(e, k = k), path)
      Ann.delete(s, path,
        e.where(pmod(col("vec_id"), lit(7)) === 3).select("vec_id"))
      path
    }

  /** Retrain-policy roundtrip per (sfDir, k), built at most once per
    * process: the index is trained on a deliberately unrepresentative
    * slice (the 32 lowest-id vectors — the worst warm-up a production
    * index starts from), grown to the full corpus by `Ann.append`
    * against those frozen centroids, and then taken through the
    * trigger: `Ann.needsRetrain` at the (deliberately tight — see
    * [[simIvfRetrain]]) `RetrainMaxSkew` threshold fires a warm-start
    * `Ann.retrain`. Pre/post occupancy skew and whether the trigger
    * fired ride along for the entry's gate. */
  private val ivfRetrained = scala.collection.concurrent.TrieMap
    .empty[(String, Int), (String, Double, Double, Boolean)]

  /** The registry's retrain trigger. Production sets this from the
    * probe-latency SLO (typically 1.5–3× mean occupancy); the registry
    * pins it tight enough that the synthetic corpus — whose
    * near-isotropic embeddings keep occupancy mild — still drives the
    * full trigger → retrain roundtrip every run. */
  private[ops] val RetrainMaxSkew = 1.05

  /** Post-retrain balance ceiling the entry asserts: occupancy must sit
    * within 1.5× of mean. Observed post-retrain skew is ≤ 1.19 across
    * every sf (IvfRetrainProbe), so the ceiling has deterministic
    * margin while still catching a degenerate refit (mass collapsing
    * into few cells reads ≫ 1.5). */
  private[ops] val RetrainSkewCeiling = 1.5

  /** The memo value's boolean is `refit_ok`: TRUE iff the trigger was
    * honored AND, when it fired, the retrain VERIFIABLY rewrote the
    * quantizer (the loaded centroid table changed) — an independent
    * observation of the refit's effect, not a restatement of the
    * trigger predicate, so a regression that drops the retrain call or
    * mis-wires the threshold turns the entry's gate false instead of
    * passing vacuously. */
  private def retrainedIvfPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): (String, Double, Double, Boolean) =
    graft.BuildOnce.memo(ivfRetrained, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_rt_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      val e = Tables.embeddings(s, d)
      Ann.save(Ann.build(e.where(col("vec_id") < 32), k = k), path)
      Ann.append(s, path, e.where(col("vec_id") >= 32))
      val preIdx = Ann.load(s, path)
      val pre = Ann.cellSkew(preIdx)
      val fired = Ann.needsRetrain(preIdx, RetrainMaxSkew)
      if (fired) Ann.retrain(s, path, iters = 2)
      val postIdx = Ann.load(s, path)
      val post = Ann.cellSkew(postIdx)
      val refitOk = !fired || postIdx.centroids != preIdx.centroids
      (path, pre, post, refitOk)
    }

  /** The RETRAIN leg of the ANN maintenance lifecycle, driver-verified:
    * `Ann.append`'s frozen-centroid contract degrades cell balance
    * silently as appended content outgrows the training slice, so the
    * policy loop is measure (`Ann.cellSkew` — one bounded count
    * aggregation) → trigger (`Ann.needsRetrain` against the SLO
    * threshold) → warm-start `Ann.retrain` (Lloyd refinements from the
    * saved centroids, one re-assignment pass, both layout directories
    * swap-replaced). This entry drives that loop end-to-end on an index
    * built from the worst warm-up (32 seed vectors, everything else
    * appended) and serves a probe off the RETRAINED layout.
    *
    * Gate discipline: the hash anchor is the brute-force top-5
    * (retrain changes the index layout, never the true neighbors) with
    * the `recall_ok` ≥ 3/5 boolean proving the refit still serves, and
    * one `skew_ok` boolean the oracle asserts TRUE: when the trigger
    * fired, the retrain VERIFIABLY rewrote the quantizer (the loaded
    * centroid table changed — an independent observation, not a
    * restatement of the trigger predicate), AND post-retrain occupancy
    * sits under [[RetrainSkewCeiling]]. Both booleans are
    * deterministic: occupancy is a pure function of the data and the
    * seeded, tie-broken Lloyd path. */
  val simIvfRetrain = GQuery(
    "sim_ivf_retrain",
    (s, d) => {
      val (path, _, post, refitOk) = retrainedIvfPath(s, d, k = 8)
      val skewOk = refitOk && post < RetrainSkewCeiling
      recallAnchored(s, d,
        Ann.query(Ann.load(s, path), probeId = 0, topK = IvfTopK,
          nProbe = 3, knownProbe = Some(probeEmbedding(s, d))),
        IvfTopK, minHits = 3)
        .withColumn("skew_ok", lit(skewOk))
    },
    Some(s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0)
      SELECT rnk, neighbor_id, TRUE AS recall_ok, TRUE AS skew_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """))

  /** Retrain roundtrip for the COMPRESSED index per (sfDir, k, m) —
    * `sim_ivf_retrain`'s IVF-PQ twin: worst warm-up (32 seed vectors
    * train BOTH quantizers), everything else appended against the
    * frozen pair, the same skew trigger, then `Ivfpq.retrain` refits
    * coarse centroids AND product codebooks over the full residents.
    * The memo boolean is refit_ok: the trigger honored and, when
    * fired, the refit VERIFIABLY rewrote at least one quantizer
    * (centroids or codebooks changed — independent observation, the
    * `sim_ivf_retrain` discipline). */
  private val ivfpqRetrained = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int), (String, Double, Double, Boolean)]

  private def retrainedIvfpqPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int, m: Int): (String, Double, Double, Boolean) =
    graft.BuildOnce.memo(ivfpqRetrained, (d, k, m)) {
      val path = s"${graft.GraftSession.scratchDir}/ivfpq_rt_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k${k}_m$m"
      val e = Tables.embeddings(s, d)
      Ivfpq.save(Ivfpq.build(e.where(col("vec_id") < 32), k = k, m = m,
        codes = 16), path)
      Ivfpq.append(s, path, e.where(col("vec_id") >= 32))
      val preIdx = Ivfpq.load(s, path)
      val pre = Ann.cellSkew(Ann.IvfIndex(preIdx.centroids,
        preIdx.encoded))
      val fired = pre > RetrainMaxSkew
      if (fired) Ivfpq.retrain(s, path, iters = 2)
      val postIdx = Ivfpq.load(s, path)
      val post = Ann.cellSkew(Ann.IvfIndex(postIdx.centroids,
        postIdx.encoded))
      val refitOk = !fired || postIdx.centroids != preIdx.centroids ||
        postIdx.books != preIdx.books
      (path, pre, post, refitOk)
    }

  /** The RETRAIN leg for the compressed serving index, driver-verified
    * — closes the maintenance lifecycle (append → delete → compact →
    * retrain) across BOTH vector index forms: after growing from the
    * worst warm-up, `Ivfpq.retrain` refits coarse centroids AND
    * product codebooks over the residents and the probe then runs the
    * standard two-phase search off the refit layout. Same gates as
    * `sim_ivf_retrain`: brute-force hash anchor + recall ≥ 3/5, plus
    * the deterministic `skew_ok` (refit verifiably happened when the
    * trigger fired; post-refit occupancy under the ceiling). */
  val simIvfpqRetrain = GQuery(
    "sim_ivfpq_retrain",
    (s, d) => {
      val (path, _, post, refitOk) = retrainedIvfpqPath(s, d, k = 8, m = 4)
      val skewOk = refitOk && post < RetrainSkewCeiling
      recallAnchored(s, d,
        Ivfpq.search(Ivfpq.load(s, path), probeId = 0,
          topK = IvfTopK, nProbe = 3,
          shortlist = shortlistFor(embCount(s, d)),
          knownProbe = Some(probeEmbedding(s, d))),
        topK = IvfTopK, minHits = 3)
        .withColumn("skew_ok", lit(skewOk))
    },
    Some(s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0)
      SELECT rnk, neighbor_id, TRUE AS recall_ok, TRUE AS skew_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """))

  private val ivfpqAppended =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  private def appendedIvfpqPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int, m: Int): String =
    graft.BuildOnce.memo(ivfpqAppended, (d, k, m)) {
      val path = s"${graft.GraftSession.scratchDir}/ivfpq_app_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k${k}_m$m"
      val e = Tables.embeddings(s, d)
      Ivfpq.save(Ivfpq.build(e.filter(pmod(col("vec_id"), lit(2)) === 0),
        k = k, m = m, codes = 16), path)
      Ivfpq.append(s, path, e.filter(pmod(col("vec_id"), lit(2)) === 1))
      path
    }

  /** Incremental maintenance of the COMPRESSED serving index,
    * driver-visible end-to-end (`sim_ivf_append`'s IVF-PQ twin, the
    * genuine 100 TB serving loop: the codes-only index grows between
    * retrains without re-encoding the corpus): coarse centroids AND
    * product codebooks are trained on HALF the corpus, the other half
    * is `Ivfpq.append`ed against both frozen quantizers (cell-assign +
    * PQ-encode of just the new batch, append-mode into the cell
    * partition directories, ONCE per process), and the probe then
    * runs the standard two-phase search over the merged layout — same
    * partition pruning, same codes-only ADC scan, same recall gate as
    * `sim_ivfpq`. This is deliberately the half-stale-quantizer WORST
    * case; the exact re-rank absorbs code-quality drift for anything
    * reaching the shortlist, which is precisely the property the
    * recall boolean verifies. `IvfpqAppendSpec` pins append ≡
    * build-time encode of the same rows (bit-identical codes, no new
    * cells) and the schema fail-fast gate. */
  /** Tombstoned-delete path for the COMPRESSED index per (sfDir, k, m),
    * built at most once per process: full build + save, then the
    * vec_id ≡ 2 (mod 5) residue class tombstoned via `Ivfpq.delete` —
    * the cell directories and both side tables untouched. */
  private val ivfpqDeleted =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  private def deletedIvfpqPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int, m: Int): String =
    graft.BuildOnce.memo(ivfpqDeleted, (d, k, m)) {
      val path = s"${graft.GraftSession.scratchDir}/ivfpq_del_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k${k}_m$m"
      val e = Tables.embeddings(s, d)
      Ivfpq.save(Ivfpq.build(e, k = k, m = m, codes = 16), path)
      Ivfpq.delete(s, path,
        e.where(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"))
      path
    }

  /** DELETE on the compressed serving index, driver-verified —
    * `sim_ivf_delete`'s IVF-PQ twin, closing the delete lifecycle
    * across every persisted index form (postings, IVF, IVF-PQ): ~1/5
    * of the residents are tombstoned and the standard two-phase search
    * (codes-only ADC scan → exact re-rank) then runs over the
    * survivors — the tombstone anti-join sits below BOTH phases via
    * `Ivfpq.load`, so a deleted id can neither reach the shortlist nor
    * re-enter at re-rank. Anchored against the brute-force top-5 over
    * the survivors with the usual recall ≥ 3/5 gate. */
  val simIvfpqDelete = GQuery(
    "sim_ivfpq_delete",
    (s, d) => recallAnchored(s, d,
      Ivfpq.search(Ivfpq.load(s, deletedIvfpqPath(s, d, k = 8, m = 4)),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d)),
        knownProbe = Some(probeEmbedding(s, d))),
      topK = IvfTopK, minHits = 3,
      extraFilter = Some(pmod(col("vec_id"), lit(5)) =!= 2)),
    Some(s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0 AND e.vec_id % 5 <> 2)
      SELECT rnk, neighbor_id, TRUE AS recall_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """))

  val simIvfpqAppend = GQuery(
    "sim_ivfpq_append",
    (s, d) => recallAnchored(s, d,
      Ivfpq.search(Ivfpq.load(s, appendedIvfpqPath(s, d, k = 8, m = 4)),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d)),
        knownProbe = Some(probeEmbedding(s, d))),
      topK = IvfTopK, minHits = 3),
    Some(ivfRecallOracle))

  /** The post-update corpus shared by the `sim_ivfpq_update` layout,
    * its brute anchor, and (as SQL) its oracle: the vec_id ≡ 3 (mod 7)
    * residue's embeddings REVERSED — a deterministic, engine-agnostic
    * edit that moves every updated vector's cosine neighborhood. */
  private def updatedEmbeddings(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      when(pmod(col("vec_id"), lit(7)) === 3, reverse(col("embedding")))
        .otherwise(col("embedding")).as("embedding"))

  /** Full build, then the mod-7 residue upserted with reversed
    * embeddings through `Ivfpq.update`'s single-marker
    * delete→compact→append composition. */
  private val ivfpqUpdated =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  private def updatedIvfpqPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int, m: Int): String =
    graft.BuildOnce.memo(ivfpqUpdated, (d, k, m)) {
      val path = s"${graft.GraftSession.scratchDir}/ivfpq_upd_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k${k}_m$m"
      val e = Tables.embeddings(s, d)
      Ivfpq.save(Ivfpq.build(e, k = k, m = m, codes = 16), path)
      Ivfpq.update(s, path,
        updatedEmbeddings(s, d)
          .where(pmod(col("vec_id"), lit(7)) === 3)
          .localCheckpoint(true),
        batchId = 1L)
      path
    }

  /** Shared oracle of the two update entries: brute-force top-5 over
    * the post-update corpus (the same reversed-residue edit inline),
    * recall asserted TRUE. */
  private val updatedRecallOracle = s"""
      WITH up AS (
        SELECT vec_id,
               CASE WHEN vec_id % 7 = 3 THEN list_reverse(embedding)
                    ELSE embedding END AS embedding
        FROM embeddings),
      probe AS (SELECT embedding AS probe_emb FROM up WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM up e, probe p
        WHERE e.vec_id <> 0)
      SELECT rnk, neighbor_id, TRUE AS recall_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """

  /** Full float-IVF build, then the mod-7 residue upserted with
    * reversed embeddings through `Ann.update`'s single-marker
    * composition — `sim_ivf_update`'s layout. */
  private val ivfUpdated =
    scala.collection.concurrent.TrieMap.empty[(String, Int), String]

  private def updatedIvfPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int): String =
    graft.BuildOnce.memo(ivfUpdated, (d, k)) {
      val path = s"${graft.GraftSession.scratchDir}/ivf_upd_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k$k"
      Ann.save(Ann.build(Tables.embeddings(s, d), k = k), path)
      Ann.update(s, path,
        updatedEmbeddings(s, d)
          .where(pmod(col("vec_id"), lit(7)) === 3)
          .localCheckpoint(true),
        batchId = 1L)
      path
    }

  /** UPDATE ≡ rebuild on the FLOAT index — `sim_ivfpq_update`'s twin
    * without the code-distortion variable: the updated residue
    * re-assigns cells under the frozen centroids, the probe reads true
    * embeddings in its probed cells, and recall against the
    * post-update brute force holds at the standard (nProbe 3, ≥3/5)
    * gate. Same oracle as the compressed twin; `AnnUpdateSpec` pins
    * layout ≡ frozen-centroid rebuild and the replay no-op. */
  val simIvfUpdate = GQuery(
    "sim_ivf_update",
    (s, d) => recallAnchoredOf(
      bruteTopKOf(updatedEmbeddings(s, d), IvfTopK,
        knownProbe = Some(probeEmbedding(s, d))),
      Ann.query(Ann.load(s, updatedIvfPath(s, d, k = 8)),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        knownProbe = Some(probeEmbedding(s, d))),
      minHits = 3),
    Some(updatedRecallOracle))

  /** UPDATE ≡ rebuild for the compressed serving index — the last
    * lifecycle identity on the vector side (`bm25_serve_update`'s
    * IVF-PQ twin): ~1/7 of the vectors are upserted with CHANGED
    * embeddings via the atomic single-marker delete→compact→append,
    * and the standard two-phase search over the updated layout is
    * anchored against the brute-force top-5 of the POST-UPDATE corpus
    * (the oracle recomputes the same edit inline). The updated rows'
    * cells and codes both move — frozen quantizers re-assign and
    * re-encode them — so the hash match certifies the full
    * composition, not just row plumbing. `IvfpqUpdateSpec` pins the
    * marker replay no-op. Shortlist floor is raised to 100 (20% at the
    * smallest SF): the frozen quantizers are one update STALER relative
    * to the post-update corpus than in the append/delete twins — the
    * updated residue's old neighbors vacate the true top-k and their
    * replacements carry more code distortion, so the ADC phase needs a
    * deeper exact re-rank to hold the recall gate (measured: 2/5 at
    * the 50 floor, 5/5 at 100, sf0.001). */
  val simIvfpqUpdate = GQuery(
    "sim_ivfpq_update",
    (s, d) => recallAnchoredOf(
      bruteTopKOf(updatedEmbeddings(s, d), IvfTopK,
        knownProbe = Some(probeEmbedding(s, d))),
      Ivfpq.search(Ivfpq.load(s, updatedIvfpqPath(s, d, k = 8, m = 4)),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d), minS = 100),
        knownProbe = Some(probeEmbedding(s, d))),
      minHits = 3),
    Some(updatedRecallOracle))

  /** Online batched ANN serving, driver-visible end-to-end: load the
    * persisted index ([[savedIvfPath]] — the build is paid once per
    * process), collect the 3-probe request batch (bounded by nature —
    * this is the serving contract, not a data collect), answer all of
    * them in ONE distributed `Ann.serveBatch` pass, and emit each
    * probe's brute-force top-`IvfTopK` as the hash anchor plus a
    * PER-PROBE `recall_ok` tolerance boolean (the served top-K must
    * hit ≥ 3 of that probe's brute top-K — recall@5 ≥ 0.6, the same
    * gate as `sim_ivf`) which the oracle asserts TRUE. This is exactly
    * the micro-batch body `StreamRunner.annServeStream` runs per
    * trigger, so the streaming serving path inherits this driver
    * verification (AnnServeSpec pins stream ≡ batch ≡ per-probe
    * `Ann.query`). */
  val simServe = GQuery(
    "sim_serve",
    (s, d) => {
      // r20 §5: the 3-probe request batch via the once-per-process
      // probe memo instead of a collect job per timed rep
      val batch: Seq[(Long, Seq[Double])] =
        (0L until 3L).map(i => (i, probeEmbedding(s, d, i)))
      val served = Ann.serveBatch(Ann.load(s, savedIvfPath(s, d, k = 8)),
        batch, topK = IvfTopK, nProbe = 3)
      perProbeRecallAnchored(s, d, served)
    },
    Some(serveRecallOracle))

  /** Per-probe twin of [[recallAnchored]], shared by `sim_serve` and
    * `knn_join`: anchor on the brute-force top-`IvfTopK` of the probes
    * with vec_id < 3 (bounded — broadcastable by construction) and
    * attach a PER-PROBE `recall_ok` (≥ 3 of that probe's exact top-K
    * present in `served`, i.e. recall@5 ≥ 0.6). `served` may carry
    * answers for MORE probes (knn_join answers the whole corpus); only
    * the anchored slice is emitted, the mechanism still ran unbounded. */
  private def perProbeRecallAnchored(s: org.apache.spark.sql.SparkSession,
      d: String, served: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, d)
    // Slice BEFORE the broadcast: for knn_join `served` is |corpus|·topK
    // rows, and only the anchored probes (vec_id < 3) are emitted — an
    // unfiltered broadcast would grow driver memory linearly with the
    // corpus for rows the join can never match.
    val hits = served.filter(col("probe_id") < 3)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("hit"))
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        (dot(col("embedding"), col("pemb")) /
          (sqrt(sumSq(col("embedding"))) * sqrt(sumSq(col("pemb")))))
          .as("sim"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= IvfTopK)
      .join(broadcast(hits), Seq("probe_id", "neighbor_id"), "left")
      .select(col("probe_id"), col("rnk"), col("neighbor_id"),
        (sum(coalesce(col("hit"), lit(0L)))
          .over(Window.partitionBy(col("probe_id"))) >= 3).as("recall_ok"))
      .transform(Out.boundedSort(_, col("probe_id"), col("rnk")))
  }

  /** DuckDB twin of [[perProbeRecallAnchored]]. Lazy: referenced by
    * `simServe`, which initializes earlier in this object. */
  private lazy val serveRecallOracle = s"""
      WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pemb
        FROM embeddings WHERE vec_id < 3),
      scored AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.pemb) AS sim
        FROM embeddings e CROSS JOIN probes p
        WHERE e.vec_id <> p.probe_id)
      SELECT probe_id, rnk, neighbor_id, TRUE AS recall_ok FROM (
        SELECT probe_id, neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        FROM scored)
      WHERE rnk <= $IvfTopK
      ORDER BY probe_id, rnk
    """

  /** kNN JOIN ([[Ann.knnJoin]]) — every corpus row retrieves its top-K
    * index neighbors through the shared-cell equi-join (NEITHER side
    * broadcast or collected: probes rank cells row-side, explode to
    * nProbe cells, and meet the inverted lists in a join ON cell — the
    * two-big-sides shape of corpus-scale semantic decontamination).
    * The mechanism answers ALL probes; the driver-verified output is
    * the vec_id < 3 anchored slice with per-probe recall booleans
    * (same oracle as `sim_serve`). KnnJoinSpec pins single-probe ≡
    * `Ann.query` (identical routing tie-breaks) and cartesian-free
    * plans. */
  val knnJoin = GQuery(
    "knn_join",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val index = Ann.load(s, savedIvfPath(s, d, k = 8))
      val served = Ann.knnJoin(index,
        e.select(col("vec_id").as("probe_id"),
          col("embedding").as("probe_emb")),
        topK = IvfTopK, nProbe = 3)
      perProbeRecallAnchored(s, d, served)
    },
    Some(serveRecallOracle))

  /** ADC-scored kNN JOIN ([[Ivfpq.knnJoin]]) — `knn_join`'s
    * two-big-sides mechanism composed with the PQ serving discipline:
    * every corpus row retrieves its top-K neighbors through the
    * shared-cell equi-join, but candidate scoring reads ONLY the
    * persisted (id, cell, codes) projection (m bytes/candidate, the
    * codes-only ReadSchema pinned in KnnJoinPqSpec) and the true
    * embeddings are touched just for the per-probe shortlist's exact
    * re-rank — the genuine 100 TB corpus-to-corpus retrieval shape.
    * Probes compute their OWN ADC lookup tables row-side (no driver
    * LUTs, no broadcast), the index is the persisted cell-partitioned
    * IVF-PQ layout ([[savedIvfpqPath]], built once per process), and
    * the driver-verified output is the vec_id < 3 anchored slice with
    * per-probe recall booleans — the same oracle as `knn_join` /
    * `sim_serve`. KnnJoinPqSpec pins single-probe ≡ `Ivfpq.search`
    * (bit-identical ADC via the shared fold order) and cartesian-free
    * plans. */
  val knnJoinPq = GQuery(
    "knn_join_pq",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val index = Ivfpq.load(s, savedIvfpqPath(s, d, k = 8, m = 4))
      val served = Ivfpq.knnJoin(index,
        e.select(col("vec_id").as("probe_id"),
          col("embedding").as("probe_emb")),
        topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d)))
      perProbeRecallAnchored(s, d, served)
    },
    Some(serveRecallOracle))

  /** SEMANTIC decontamination, driver-verified end-to-end: every
    * corpus document retrieves its nearest neighbor IN A SEPARATE
    * REFERENCE SET (the held-out eval-benchmark embeddings — here the
    * vec_id % 5 == 0 slice stands in), and a document whose nearest
    * benchmark neighbor is too similar is a contamination hit. This is
    * the embedding-space sibling of the 5-gram `decontaminate` entry:
    * n-gram matching catches verbatim leakage, the semantic form
    * catches paraphrase.
    *
    * Plan shape (r21, guide §2.4/§3.1 — this entry regressed in every
    * r20 battery and its r20 plan was structurally wasteful): the entry
    * is EXACT by definition (nProbe = k full probing in r20's
    * [[Ann.knnJoin]] form), and under full probing the cell equi-join
    * is a cross product in disguise — every (corpus row, ref row) pair
    * was materialized through an 8-distinct-key cell shuffle and a
    * |corpus|·|refs|-row window just to keep one row per probe. The
    * direct form of the same computation broadcasts the BOUNDED
    * benchmark side (eval sets are small by nature; the corpus side
    * stays unbounded and never shuffles a row) and takes max(sim) with
    * a map-side partial aggregate: the r20 plan's 2 corpus-scaled
    * exchanges drop to one |corpus|-row aggregate exchange. The sim
    * expression is [[Ann.guardedSim]] with the probe norm hoisted per
    * corpus row — the IDENTICAL VecMath kernel and operand order as
    * knnJoin's, and max() over the same double set is order-free, so
    * the output (max sim rounded through DECIMAL(38,4) + the threshold
    * flag computed FROM the rounded value) hash-verifies against the
    * oracle's brute-force recompute with no tolerance boolean, exactly
    * as before. The pruned cartesian-free join mechanism remains
    * demonstrated (and recall-gated) by `knn_join` / `knn_join_pq`; a
    * production run whose reference set outgrows the broadcast budget
    * switches back to it and tunes nProbe against their recall gate. */
  val deconSemantic = GQuery(
    "decon_semantic",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val corpus = e.filter(pmod(col("vec_id"), lit(5)) =!= 0)
        .select(col("vec_id").as("probe_id"),
          col("embedding").as("probe_emb"))
        .withColumn("_probe_norm",
          sqrt(graft.functions.VecMath.vecNormSq(col("probe_emb"))))
      val refs = e.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("embedding").as("ref_emb"))
      corpus.crossJoin(broadcast(refs))
        .select(col("probe_id"),
          Ann.guardedSim(col("ref_emb"), col("probe_emb"),
            col("_probe_norm")).as("sim"))
        .groupBy(col("probe_id"))
        .agg(max(col("sim")).as("sim"))
        .select(col("probe_id"),
          round(col("sim"), 4).cast(DecimalType(38, 4))
            .cast(DoubleType).as("max_sim"))
        .select(col("probe_id"), col("max_sim"),
          (col("max_sim") >= lit(0.2)).as("contaminated"))
        .orderBy("probe_id")
    },
    Some("""
      WITH refs AS (
        SELECT embedding AS ref_emb FROM embeddings WHERE vec_id % 5 = 0),
      corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0),
      mx AS (
        -- DOUBLE[] casts matter: on FLOAT[] inputs DuckDB accumulates the
        -- cosine in float (~1e-4 off the Spark side's double fold), which
        -- round-to-4 cannot absorb -- in double both engines agree to ulps
        SELECT c.vec_id AS probe_id,
               CAST(CAST(round(MAX(list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]),
                   CAST(r.ref_emb AS DOUBLE[]))), 4)
                 AS DECIMAL(38,4)) AS DOUBLE) AS max_sim
        FROM corpus c CROSS JOIN refs r
        GROUP BY 1)
      SELECT probe_id, max_sim, max_sim >= 0.2 AS contaminated
      FROM mx
      ORDER BY probe_id
    """))

  /** Codebooks trained at most once per process per (sfDir, params) —
    * the [[savedIvfPath]] build-once discipline applied to the PQ and
    * IVF-PQ entries: training is driver-coordinated Lloyd's whose cost
    * belongs to the (rare) retrain cadence, not to every probe, so the
    * bench reps time the SERVING shape (encode plan + ADC + re-rank).
    * `sim_ivf` deliberately keeps paying its build per invocation — it
    * is the registry's designated cold-build timing entry. */
  /** Corpus-sized ADC re-rank depth. A FIXED shortlist is the classic
    * scale trap this round's sf0.1 sweep caught red-handed: 50
    * candidates is 10% of a 500-vector corpus but 2.5% of 2000, and
    * recall@5 under the coarse m=4×16 codebooks sank below the 0.6 gate
    * the moment the corpus grew 4×. Like [[signBitsFor]] (LSH width)
    * and the MinHash band chooser, the knob must grow with N: re-rank
    * depth = `frac` of the corpus (default 10%), floored at `minS` so
    * tiny corpora keep a sane minimum, capped at `maxS` because at real
    * scale the shortlist is the exact-read budget (the re-rank phase
    * reads true embeddings for exactly this many rows — the cap IS the
    * serving-latency contract; past it you raise nProbe selectivity or
    * train finer codebooks instead of re-ranking more). */
  def shortlistFor(corpusSize: Long, frac: Double = 0.10, minS: Int = 50,
      maxS: Int = 10000): Int = {
    require(corpusSize > 0 && frac > 0,
      s"shortlistFor: corpusSize=$corpusSize frac=$frac must be positive")
    math.max(minS, math.min(maxS, math.ceil(corpusSize * frac).toInt))
  }

  /** Corpus-sized PQ codebook capacity for the FLAT (un-pruned) PQ
    * path: codes ≈ N/32 rounded up to a power of two, clamped to
    * [16, 256] (256 = one byte per code, the PQ storage contract).
    * The PqTune sweep at 2000 vectors showed WHY this knob — not just
    * re-rank depth — must grow with N: at codes=16 even a 25% shortlist
    * recalled 4/5, while codes=64 hit 5/5 at 10% — quantization error,
    * not shortlist depth, was the recall floor. Cell-pruned IVF-PQ
    * keeps its candidate fraction high per probe (nProbe/k of the
    * corpus), so it tolerates coarser books; the flat path has no such
    * help and must spend its capacity here. Past the 256 cap the scale
    * move is IVF cells ([[Ivfpq]]) — more coarse cells, not wider
    * books. */
  def codesFor(corpusSize: Long, minCodes: Int = 16,
      maxCodes: Int = 256): Int = {
    require(corpusSize > 0,
      s"codesFor: corpusSize=$corpusSize must be positive")
    val target = math.max(1, corpusSize / 32)
    val pow2 = Integer.highestOneBit(
      math.min(target, Int.MaxValue / 2).toInt)
    val rounded = if (pow2 == target) pow2 else pow2 * 2
    math.max(minCodes, math.min(maxCodes, rounded))
  }

  /** Embedding-corpus row count per sfDir, counted once per process —
    * the sizing input for [[shortlistFor]] and [[codesFor]] (a real
    * deployment knows its corpus cardinality; here one cheap columnar
    * count stands in). */
  private val corpusCount =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  private[ops] def embCount(s: org.apache.spark.sql.SparkSession,
      d: String): Long =
    graft.BuildOnce.memo(corpusCount, d)(Tables.embeddings(s, d).count())

  private val pqBuilt =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Pq.PqIndex]

  /** Build once per process AND materialize the encoded corpus to
    * scratch parquet — `PqIndex.encoded` is otherwise a lazy frame, so
    * every serving query would re-run the argmin encode (m · codes
    * literal-centroid folds per row, a multi-second Janino method at
    * corpus-sized codebooks) instead of scanning codes at rest. The
    * parquet roundtrip is the deployment shape: codes are written once
    * at index build and SERVED from storage. Cold build+encode cost
    * stays visible in `sim_ivf` (per-invocation by design). */
  private def builtPq(s: org.apache.spark.sql.SparkSession, d: String,
      m: Int, codes: Int): Pq.PqIndex =
    graft.BuildOnce.memo(pqBuilt, (d, m, codes)) {
      val idx = Pq.build(Tables.embeddings(s, d), m = m, codes = codes)
      val path = s"${graft.GraftSession.scratchDir}/pq_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_m${m}_c$codes"
      idx.encoded.write.mode("overwrite").parquet(path)
      idx.copy(encoded = graft.Pq.read(s, path))
    }

  private val ivfpqBuilt = scala.collection.concurrent.TrieMap
    .empty[(String, Int, Int, Int), Ivfpq.IvfPqIndex]

  private def builtIvfpq(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int, m: Int, codes: Int): Ivfpq.IvfPqIndex =
    graft.BuildOnce.memo(ivfpqBuilt, (d, k, m, codes))(
      Ivfpq.build(Tables.embeddings(s, d), k = k, m = m, codes = codes))

  /** Product-quantized ANN ([[Pq]]), driver-visible end-to-end: m=4
    * subspace codebooks sized to the corpus ([[codesFor]] — 16 codes at
    * 500 vectors, 64 at 2000; distributed Lloyd's, same seeding
    * convention as the IVF build — trained ONCE per process via
    * [[builtPq]]), the corpus encoded to 4-code arrays (the
    * compressed-index half of IVF-PQ serving at 100 TB), probe 0
    * ADC-scored with driver-computed lookup tables, and the
    * corpus-sized shortlist ([[shortlistFor]]) exact-reranked to the
    * final top-5. Emits the shared brute-force hash anchor +
    * `recall_ok` (recall@5 ≥ 0.6 against exact, same gate as `sim_ivf`)
    * asserted by the same oracle — and the sf0.1 sweep proved both
    * choosers load-bearing: fixed (codes=16, shortlist=50) passes at
    * 500 vectors and FAILS the gate at 2000. Cold-build cost is timed
    * by `sim_ivf`, not here. */
  val simPq = GQuery(
    "sim_pq",
    (s, d) => recallAnchored(s, d,
      Pq.search(builtPq(s, d, m = 4, codes = codesFor(embCount(s, d))),
        probeId = 0, topK = IvfTopK,
        shortlist = shortlistFor(embCount(s, d))),
      topK = IvfTopK, minHits = 3),
    Some(ivfRecallOracle))

  /** IVF-PQ ([[Ivfpq]]) — the COMPOSED 100 TB serving index, driver-
    * visible end-to-end: coarse k=8 cells prune WHICH rows get scored
    * (nProbe 3), product codes (m=4 × 16) compress WHAT scoring costs,
    * ADC shortlists 50 candidates reading ONLY (id, codes), and the
    * exact re-rank reads true embeddings for just those rows. Both
    * trainings run ONCE per process ([[builtIvfpq]] — cold-build cost
    * is `sim_ivf`'s job); this entry times the in-memory two-phase
    * search, `sim_ivfpq_loaded` the persisted serving path. Same hash
    * anchor + recall@5 ≥ 0.6 oracle as `sim_ivf`. */
  val simIvfpq = GQuery(
    "sim_ivfpq",
    (s, d) => recallAnchored(s, d,
      Ivfpq.search(builtIvfpq(s, d, k = 8, m = 4, codes = 16),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d)),
        knownProbe = Some(probeEmbedding(s, d))),
      topK = IvfTopK, minHits = 3),
    Some(ivfRecallOracle))

  /** Saved IVF-PQ index per (sfDir, k, m), built at most once per
    * process — same contract as [[savedIvfPath]]: bench reps measure
    * the SERVING path (load → pruned compressed probe), which is the
    * claim this entry exists to demonstrate. */
  private val ivfpqSaved =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  private[ops] def savedIvfpqPath(s: org.apache.spark.sql.SparkSession,
      d: String, k: Int, m: Int): String =
    graft.BuildOnce.memo(ivfpqSaved, (d, k, m)) {
      val path = s"${graft.GraftSession.scratchDir}/ivfpq_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + s"_k${k}_m$m"
      Ivfpq.save(Ivfpq.build(Tables.embeddings(s, d), k = k, m = m,
        codes = 16), path)
      path
    }

  /** The persisted IVF-PQ serving path: build → `Ivfpq.save` (inverted
    * lists as cell partition directories, ONCE per process) → load →
    * two-phase search. On the loaded index the cell restriction is
    * partition pruning AND the ADC phase's scan reads only the codes
    * column (both plan-pinned in `IvfpqSpec`) — at 100 TB a probe reads
    * `nProbe/k` of the rows at `m` bytes each instead of the full
    * float corpus. Same driver-verified recall output as `sim_ivf`. */
  val simIvfpqLoaded = GQuery(
    "sim_ivfpq_loaded",
    (s, d) => recallAnchored(s, d,
      Ivfpq.search(Ivfpq.load(s, savedIvfpqPath(s, d, k = 8, m = 4)),
        probeId = 0, topK = IvfTopK, nProbe = 3,
        shortlist = shortlistFor(embCount(s, d)),
        knownProbe = Some(probeEmbedding(s, d))),
      topK = IvfTopK, minHits = 3),
    Some(ivfRecallOracle))

  /** Query-time FILTERED search on the COMPRESSED index —
    * `sim_filtered`'s semantics carried onto the IVF-PQ serving path,
    * completing the (filter × {IVF, IVF-PQ}) matrix: the payload
    * predicate applies after cell pruning and BEFORE the ADC shortlist
    * ([[Ivfpq.search]]'s `candidateFilter`), so the compressed budget is
    * spent only on matching rows and the result is the k best MATCHES —
    * never the matching subset of an unfiltered shortlist (the classic
    * filtered-ANN bug, same contract as the uncompressed path). The
    * exact re-rank then reads true embeddings for ≤shortlist matching
    * rows. Anchored against the FILTERED brute-force top-5 with the
    * usual recall tolerance; `IvfpqSpec` pins the candidate-set
    * semantics under full probing. */
  val simIvfpqFiltered = GQuery(
    "sim_ivfpq_filtered",
    (s, d) => {
      val pred = pmod(col("vec_id"), lit(3)) === 0
      recallAnchored(s, d,
        Ivfpq.search(Ivfpq.load(s, savedIvfpqPath(s, d, k = 8, m = 4)),
          probeId = 0, topK = IvfTopK, nProbe = 3,
          shortlist = shortlistFor(embCount(s, d)),
          candidateFilter = Some(pred),
          knownProbe = Some(probeEmbedding(s, d))),
        IvfTopK, minHits = 3, extraFilter = Some(pred))
    },
    Some(s"""
      WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0),
      sims AS (
        SELECT e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.probe_emb) AS sim
        FROM embeddings e, probe p
        WHERE e.vec_id <> 0 AND e.vec_id % 3 = 0)
      SELECT rnk, neighbor_id, TRUE AS recall_ok
      FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
                   neighbor_id
            FROM sims)
      WHERE rnk <= $IvfTopK
      ORDER BY rnk
    """))

  /** Int8 max-abs quantization — the storage-compression pass an
    * embedding corpus runs before ANN serving (4× smaller than float32,
    * 8× smaller than the double intermediates). Pure narrow map over the
    * scan: per vector, scale by 127/max|x| and round half-away-from-zero
    * (the shared Spark/DuckDB rounding). The int list is emitted as a
    * ','-joined string so the hash compare stays scalar; the scale
    * factor is rounded into a decimal to absorb float-division ulps.
    * Degenerate all-zero vectors (maxabs = 0) quantize to 0 explicitly
    * on BOTH engines — without the guard Spark folds round(0/0)=NaN
    * silently to 0 on the Long cast while DuckDB raises on
    * CAST(NaN AS BIGINT), so a single zero vector would fail the whole
    * oracle query. */
  val embedQuantize = GQuery(
    "embed_quantize",
    (s, d) => {
      val absd = transform(col("embedding"), x => abs(x.cast(DoubleType)))
      val maxabs = array_max(absd)
      val q = transform(col("embedding"),
        x => when(maxabs === 0d, lit(0L))
          .otherwise(round(x.cast(DoubleType) * 127.0 / maxabs)
            .cast(LongType)))
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 50)
        .select(col("vec_id"),
          round(maxabs / 127.0, 6).cast(DecimalType(38, 6))
            .cast(DoubleType).as("scale"),
          array_join(transform(q, _.cast(StringType)), ",").as("qvec"))
        .orderBy("vec_id")
    },
    Some("""
      SELECT vec_id,
             CAST(CAST(round(list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) / 127.0, 6) AS DECIMAL(38,6)) AS DOUBLE) AS scale,
             array_to_string(list_transform(embedding,
               x -> CASE WHEN list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) = 0
                    THEN '0'
                    ELSE CAST(CAST(round(CAST(x AS DOUBLE) * 127.0 /
                      list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))) AS BIGINT) AS VARCHAR)
                    END), ',') AS qvec
      FROM embeddings
      WHERE vec_id < 50
      ORDER BY vec_id
    """))

  /** Batched ANN serving shape: top-3 neighbors for EACH of 5 probe
    * vectors in one query. The probe set broadcasts (a query batch is
    * small by nature), every candidate partition scores all probes in
    * one pass, and the per-probe top-k goes through a rank-filtered
    * window — WindowGroupLimit prunes to k rows per probe BELOW the
    * shuffle, so the exchange moves O(|probes|·k·partitions) rows, not
    * the scored cross product. Output is ids/ranks only (hash can't
    * wobble on float ulps). */
  val simTopkBatch = GQuery(
    "sim_topk_batch",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      e.filter(col("vec_id") >= 5)
        .crossJoin(broadcast(probes))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          (dot(col("embedding"), col("pemb")) /
            (sqrt(sumSq(col("embedding"))) * sqrt(sumSq(col("pemb")))))
            .as("sim"))
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .filter(col("rnk") <= 3)
        .select(col("probe_id"), col("rnk"), col("neighbor_id"))
        .transform(Out.boundedSort(_, col("probe_id"), col("rnk")))
    },
    Some("""
      WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pemb
        FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT p.probe_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(e.embedding, p.pemb) AS sim
        FROM embeddings e CROSS JOIN probes p
        WHERE e.vec_id >= 5)
      SELECT probe_id, rnk, neighbor_id FROM (
        SELECT probe_id, neighbor_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        FROM scored)
      WHERE rnk <= 3
      ORDER BY probe_id, rnk
    """))

  def all: Seq[GQuery] =
    Seq(vecNorm, simTopk, simBucketed, simPairs, dedupEmbed,
      dedupEmbedCluster, simIvf, simIvfLoaded, simFiltered, simIvfAppend,
      simIvfEpoch, simIvfpqEpoch,
      simIvfDelete, simIvfRetrain, simIvfUpdate, simIvfpqAppend,
      simIvfpqDelete, simIvfpqRetrain, simIvfpqUpdate, simServe,
      simPq, simIvfpq, simIvfpqLoaded, simIvfpqFiltered,
      knnJoin, knnJoinPq, deconSemantic,
      embedQuantize, simTopkBatch)
}
