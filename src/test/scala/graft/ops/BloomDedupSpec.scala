package graft.ops

import graft.SparkTestBase
import graft.functions.BloomProbe
import org.apache.spark.sql.functions._

/** Pins the Bloom pre-filter contract `dedup_bloom` leans on: the
  * build-side hash convention (`xxhash64` longs via `stat.bloomFilter`)
  * and the probe-side `BloomFilterMightContain` read the same bits, so
  * members are NEVER missed (exactness of the pre-filtered join), and
  * the false-positive rate on disjoint content stays near the requested
  * fpp (the verification join's left side actually shrinks). */
class BloomDedupSpec extends SparkTestBase {

  private def bits(texts: Seq[String], fpp: Double = 0.01): Array[Byte] = {
    import spark.implicits._
    BloomProbe.serialize(
      texts.toDF("text").select(xxhash64(col("text")).as("h"))
        .stat.bloomFilter("h", texts.size.toLong, fpp))
  }

  test("no false negatives: every inserted text probes true") {
    import spark.implicits._
    val texts = (0 until 500).map(i => s"doc body number $i with words")
    val b = bits(texts)
    val missed = texts.toDF("text")
      .filter(!BloomProbe.mightContain(b, xxhash64(col("text"))))
      .count()
    assert(missed === 0L)
  }

  test("false-positive rate on disjoint content is near fpp") {
    import spark.implicits._
    val b = bits((0 until 500).map(i => s"history entry $i"))
    val hits = (0 until 2000).map(i => s"unseen entry $i").toDF("text")
      .filter(BloomProbe.mightContain(b, xxhash64(col("text"))))
      .count()
    // fpp=0.01 over 2000 probes → expect ~20; generous ceiling for the
    // small-filter regime
    assert(hits <= 100L, s"fp rate too high: $hits / 2000")
  }

  test("null probe value yields null, coalesced false in the query") {
    import spark.implicits._
    val b = bits(Seq("x"))
    val out = Seq(Some("x"), None).toDF("text")
      .select(coalesce(
        BloomProbe.mightContain(b, xxhash64(col("text"))),
        lit(false)).as("maybe"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out === Seq(true, false))
  }

  test("sharded build bounds every shard's bytes and never misses a member") {
    import spark.implicits._
    val texts = (0 until 4000).map(i => s"sharded history entry $i")
    val hashes = texts.toDF("text").select(xxhash64(col("text")).as("h"))
    // force multiple shards: 4000 keys at 1% fpp need ~4.8 KB of bits;
    // a 1 KiB shard bound must split them
    val sb = BloomProbe.buildSharded(hashes, "h", 4000L, 0.01,
      maxShardBytes = 1024L)
    assert(sb.nShards >= 4, s"expected >=4 shards, got ${sb.nShards}")
    // per-shard byte bound: optimal bits for the per-shard share plus
    // the sketch wire-format overhead; the point is NO shard is the
    // monolithic array
    assert(sb.maxShardByteLen <= 2048,
      s"shard of ${sb.maxShardByteLen} B exceeds the bound")
    // no false negatives across shard routing
    val missed = texts.toDF("text")
      .filter(!coalesce(BloomProbe.mightContainSharded(sb,
        xxhash64(col("text"))), lit(false)))
      .count()
    assert(missed === 0L)
    // fp rate on disjoint content still near fpp (sharding does not
    // degrade precision)
    val hits = (0 until 2000).map(i => s"unseen sharded entry $i")
      .toDF("text")
      .filter(coalesce(BloomProbe.mightContainSharded(sb,
        xxhash64(col("text"))), lit(false)))
      .count()
    assert(hits <= 100L, s"fp rate too high: $hits / 2000")
  }

  test("broadcast-handle probe ≡ literal CASE probe on the same shards") {
    import spark.implicits._
    val texts = (0 until 4000).map(i => s"bcast history entry $i")
    val hashes = texts.toDF("text").select(xxhash64(col("text")).as("h"))
    val sb = BloomProbe.buildSharded(hashes, "h", 4000L, 0.01,
      maxShardBytes = 1024L)
    assert(sb.nShards >= 4)
    val bcast = BloomProbe.broadcastShards(spark, sb)
    // members + disjoint probes, both forms, row for row — including
    // null routing (null in → null out → coalesced false)
    val probes = (texts ++ (0 until 2000).map(i => s"unseen bcast $i"))
      .toDF("text")
      .select(col("text"), xxhash64(col("text")).as("h"))
    val both = probes.select(
      coalesce(BloomProbe.mightContainSharded(sb, col("h")), lit(false))
        .as("lit_ans"),
      coalesce(BloomProbe.mightContainShardedBroadcast(bcast, col("h")),
        lit(false)).as("bc_ans"))
    assert(both.filter(col("lit_ans") =!= col("bc_ans")).count() === 0L)
    // the broadcast form still never misses a member
    assert(texts.toDF("text")
      .filter(!coalesce(BloomProbe.mightContainShardedBroadcast(bcast,
        xxhash64(col("text"))), lit(false)))
      .count() === 0L)
    // and the probe plan carries the handle, not the shard bytes: its
    // string form stays tiny at any sketch size
    val planLen = probes
      .filter(coalesce(BloomProbe.mightContainShardedBroadcast(bcast,
        col("h")), lit(false)))
      .queryExecution.executedPlan.toString.length
    assert(planLen < 20000, s"plan unexpectedly large: $planLen chars")
  }

  test("single-shard build is result-identical to the monolithic filter") {
    import spark.implicits._
    val texts = (0 until 500).map(i => s"doc body number $i with words")
    val hashes = texts.toDF("text").select(xxhash64(col("text")).as("h"))
    val sb = BloomProbe.buildSharded(hashes, "h", 500L, 0.01,
      maxShardBytes = 8L << 20)
    assert(sb.nShards === 1)
    val mono = bits(texts)
    // same membership verdict on members and on a disjoint probe set —
    // same inserted longs, same size/fpp parameters
    val probes = (texts ++ (0 until 2000).map(i => s"unseen entry $i"))
      .toDF("text")
    val disagree = probes.select(
      coalesce(BloomProbe.mightContain(mono, xxhash64(col("text"))),
        lit(false)).as("a"),
      coalesce(BloomProbe.mightContainSharded(sb, xxhash64(col("text"))),
        lit(false)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(disagree === 0L)
  }

  test("past the total-size ceiling the build declines and callers " +
      "fall back to the exact join") {
    import spark.implicits._
    val hashes = Seq("x").toDF("text").select(xxhash64(col("text")).as("h"))
    // a pretend 10^12-key history: optimal bits blow any 1 GiB budget
    assert(BloomProbe.shardedOrNone(hashes, "h", 1000000000000L, 0.01,
      maxShardBytes = 8L << 20, maxTotalBytes = 1L << 30).isEmpty)
    // under the budget it builds
    assert(BloomProbe.shardedOrNone(hashes, "h", 1000L, 0.01,
      maxShardBytes = 8L << 20, maxTotalBytes = 1L << 30).isDefined)
  }

  test("dedup_bloom counts match the exact-join ground truth at sf0.001") {
    val row = DedupQueries.dedupBloom.fn(spark, "/root/testdata/sf0.001")
      .collect().head
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = docs.filter(col("doc_id") % 2 === 0)
      .filter(col("text").isNotNull).select("text").distinct()
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val nBatch = batch.count()
    val nDup = batch.join(hist, Seq("text"), "left_semi").count()
    assert(row.getAs[Long]("n_batch") === nBatch)
    assert(row.getAs[Long]("n_exact_dup") === nDup)
    assert(row.getAs[Long]("n_new") === nBatch - nDup)
    assert(row.getAs[Boolean]("fp_rate_ok"))
  }
}
