package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Column-API surface for probing a driver-built Bloom filter inside a
  * codegen'd plan — the membership half of incremental ("have we seen
  * this content before?") dedup against a corpus too large to re-join
  * per batch.
  *
  * WHY this shape (SURVEY §2.11 preference order, tier (a)): Spark
  * already ships the exact semantics needed — the codegen'd
  * [[BloomFilterMightContain]] predicate its own runtime-filter rule
  * injects, and the `DataFrameStatFunctions.bloomFilter` distributed
  * builder (one `treeAggregate` pass, bit-array merge) — they are just
  * not exposed together through the public Column API. This object only
  * bridges them; no new kernel code.
  *
  * Contract: build-side values and probe-side values must be hashed the
  * SAME way. The convention here matches Spark's runtime-filter
  * convention: insert `xxhash64(x)` longs at build, probe with
  * `mightContain(bits, xxhash64(x))` — BloomFilterMightContain calls
  * `mightContainLong`, the same path `putLong` fed at insert.
  *
  * 100 TB story: the bit array costs ~1.2 GB per 10⁹ distinct items at
  * 1% fpp — a driver/broadcast-sized sketch summarizing an arbitrarily
  * large history. Probing is a map-side predicate on the new batch's
  * scan (no shuffle, no history re-read); only the bloom-POSITIVE rows
  * (true dups + ~fpp false positives) proceed to the exact verification
  * join, shrinking that join's left side from |batch| to
  * |dups| + fpp·|batch|. Bloom filters have no false negatives, so the
  * pre-filter is exactness-preserving by construction — `dedup_bloom`
  * re-proves it per run against the DuckDB oracle's full exact join.
  */
object BloomProbe {

  /** Spark's portable sketch wire format (`BloomFilter.writeTo`), the
    * same bytes `BloomFilterMightContain.deserialize` expects. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bits, value)` as a Column: true iff `value` (a
    * LongType, conventionally `xxhash64(...)`) may be in the filter.
    * The bits ride as a foldable binary Literal, deserialized once per
    * task by the expression itself. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType), Bridge.expression(value)))
  }

  /** A history sketch as hash-range shards: shard `i` holds exactly the
    * keys with `pmod(hash, nShards) == i`, each shard's bit array
    * bounded by the `maxShardBytes` the build was given. Same membership
    * semantics as one big filter — no false negatives per shard, ~fpp
    * false positives — but no single allocation ever exceeds the shard
    * bound: not on the build tasks (each reduce task materializes only
    * its own shards, vs the monolithic `stat.bloomFilter` treeAggregate
    * where EVERY task allocates the full array), not in the plan (each
    * probe branch carries one shard literal). */
  final case class ShardedBloom(nShards: Int, shards: Seq[Array[Byte]]) {
    require(shards.length == nShards && nShards >= 1)
    def totalBytes: Long = shards.map(_.length.toLong).sum
    def maxShardByteLen: Int = shards.map(_.length).max
  }

  /** Standard Bloom sizing: bits = −n·ln(p)/ln²2 (the formula behind
    * `BloomFilter.create`). */
  private def optimalBits(n: Long, fpp: Double): Long =
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  /** Shard count so each shard's optimal bit array fits
    * `maxShardBytes`. */
  def shardsFor(expectedItems: Long, fpp: Double,
      maxShardBytes: Long): Int =
    math.max(1L,
      (optimalBits(math.max(expectedItems, 1L), fpp) +
        8 * maxShardBytes - 1) / (8 * maxShardBytes)).toInt

  /** Build a [[ShardedBloom]] over a LongType hash column in ONE
    * distributed pass with BOUNDED task memory: rows shuffle to their
    * hash-range shard (16 B/row — the same order as any history scan),
    * and each task builds filters only for the shards it owns, so peak
    * per-task sketch memory is ~`maxShardBytes`, not the full array.
    * With `nShards == 1` this degenerates to the monolithic filter
    * (bit-identical membership to `stat.bloomFilter` — same putLong
    * inserts).
    *
    * The driver still collects all shards (`totalBytes` ≈ the
    * monolithic size) — sharding bounds the ALLOCATION UNITS, not the
    * sketch's information content; past a total-size ceiling the
    * caller should not sketch at all (see [[shardedOrNone]]). */
  def buildSharded(hashes: org.apache.spark.sql.DataFrame,
      hashCol: String, expectedItems: Long, fpp: Double,
      maxShardBytes: Long): ShardedBloom = {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val n = shardsFor(expectedItems, fpp, maxShardBytes)
    // exact ceiling division: with n == 1 the shard is sized precisely
    // like the monolithic filter, so the degenerate case is
    // bit-identical to `stat.bloomFilter` (same size, same inserts)
    val perShard = math.max((expectedItems + n - 1) / n, 1L)
    if (n == 1)
      // Below the shard bound there is nothing to shard — use the
      // treeAggregate builder directly: scan-parallel (the shuffle
      // build's parallelism is nShards, which would be ONE task here),
      // and its full-array-per-task allocation is exactly the shard
      // bound when n == 1. Bit-identical output (same size, same
      // putLong inserts — pinned in BloomDedupSpec).
      return ShardedBloom(1, Seq(serialize(
        hashes.stat.bloomFilter(hashCol, perShard, fpp))))
    // n ≥ 2: shuffle (shard, hash) pairs so each reduce task holds only
    // its own shards; build parallelism = nShards, which at the sizes
    // that force sharding is large — size maxShardBytes accordingly.
    val parts = hashes
      .select(pmod(col(hashCol), lit(n.toLong)).cast(
        org.apache.spark.sql.types.IntegerType).as("__shard"),
        col(hashCol).cast(org.apache.spark.sql.types.LongType).as("__h"))
      .repartition(n, col("__shard"))
      .rdd.mapPartitions { it =>
        val local = scala.collection.mutable.Map.empty[Int, BloomFilter]
        it.foreach { r =>
          if (!r.isNullAt(0))
            local.getOrElseUpdate(r.getInt(0),
              BloomFilter.create(perShard, fpp)).putLong(r.getLong(1))
        }
        local.iterator.map { case (s, bf) => (s, serialize(bf)) }
      }.collect()
    // hash-partitioner collisions can land two shards in one partition
    // and (in theory) one shard in two; merge by shard id, fill gaps
    // with empty filters so probe branches always have bits to read
    val byShard = parts.groupBy(_._1).map { case (s, bs) =>
      s -> bs.map(_._2).reduce { (a, b) =>
        val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
        fa.mergeInPlace(
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
        serialize(fa)
      }
    }
    ShardedBloom(n, (0 until n).map(i =>
      byShard.getOrElse(i, serialize(BloomFilter.create(perShard, fpp)))))
  }

  /** Membership probe against a [[ShardedBloom]]: route the value to
    * its hash-range shard, test that shard's bits. One `pmod` + a
    * `CASE` over `nShards` branches, each a codegen'd
    * [[BloomFilterMightContain]] holding ONLY its shard's literal.
    * NULL value → NULL, same as the monolithic probe (callers coalesce
    * to false).
    *
    * Plan-size caveat: the CASE carries EVERY shard's byte array as a
    * literal, so the probe plan (and each probing stage's serialized
    * task binary) is still ~`totalBytes` — up to the [[shardedOrNone]]
    * ceiling (1 GiB at the callers' setting). Sharding bounds the
    * BUILD-side allocation units (per-task sketch memory), not the
    * probe plan: the monolithic literal would be the same total bytes
    * in one branch. Below the ceiling that is an accepted cost (the
    * history sketch ships to probing stages exactly once per stage,
    * like any broadcast of the same size); a deployment probing with a
    * large `nShards` on many narrow stages should instead register the
    * shard table as a `Broadcast[Array[Array[Byte]]]` consumed by a
    * custom expression, trading the literal plan for a broadcast
    * handle — not done here because every graft caller sits far below
    * the ceiling and the literal form keeps the probe a stock codegen'd
    * [[BloomFilterMightContain]]. */
  def mightContainSharded(sb: ShardedBloom, value: Column): Column = {
    import org.apache.spark.sql.functions.{lit, pmod, when}
    if (sb.nShards == 1) mightContain(sb.shards.head, value)
    else {
      val shard = pmod(value, lit(sb.nShards.toLong))
      sb.shards.zipWithIndex.tail.foldLeft(
        when(shard === 0L, mightContain(sb.shards.head, value))) {
        case (acc, (bits, i)) =>
          acc.when(shard === i.toLong, mightContain(bits, value))
      }
    }
  }

  /** The broadcast-handle probe — the scale form the
    * [[mightContainSharded]] caveat describes, now implemented: the
    * shard table ships once per executor as a Spark broadcast and the
    * plan carries only the handle (one [[BloomProbeShards]] call,
    * codegen'd via the PqLut reference-object discipline), so probe
    * plans stay O(1) bytes at ANY shard count — the form a deployment
    * probing a near-ceiling sketch from many narrow stages uses.
    * Identical membership answers to the literal CASE form
    * (`BloomDedupSpec` pins equality); the literal form remains the
    * default for the in-repo callers because their sketches sit far
    * below the ceiling and it keeps the probe a stock
    * [[BloomFilterMightContain]]. Ship the shards once with
    * [[broadcastShards]] and reuse that handle across every probe (and
    * `destroy()` it when the sketch retires) — there is deliberately NO
    * overload that broadcasts internally, because a hidden
    * per-call broadcast can neither be reused nor unpersisted and leaks
    * a driver handle per query over a long-lived session. */
  def mightContainShardedBroadcast(
      bcast: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]],
      value: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      BloomProbeShards(Bridge.expression(value), bcast))
  }

  /** Broadcast a [[ShardedBloom]]'s shard table once and hand the
    * caller the handle — the caller owns its lifecycle (reuse across
    * queries, `unpersist`/`destroy` when the history sketch is
    * retired or retrained). */
  def broadcastShards(s: org.apache.spark.sql.SparkSession,
      sb: ShardedBloom)
      : org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]] =
    s.sparkContext.broadcast(sb.shards.toArray)

  /** The documented size ceiling with automatic fallback: sketch the
    * history only while the TOTAL bit-array budget holds (at ~9.6
    * bits/key and 1% fpp, `maxTotalBytes` of 1 GiB covers ~8×10⁸ keys;
    * a 10¹⁰–10¹²-key history would demand a 12 GB–1 TB driver object —
    * the round-12 verdict's ceiling). Past it, return None and let the
    * caller send EVERY row through the exact anti-join (`lit(true)` as
    * the probe): identical results — the Bloom was only ever a
    * work-shrinking pre-filter — at the cost of the full-width exact
    * join the sketch normally avoids. The scale-out alternative past
    * this ceiling is a storage-resident filter joined by key range,
    * which stops being a broadcast-shaped sketch at all. */
  def shardedOrNone(hashes: org.apache.spark.sql.DataFrame,
      hashCol: String, expectedItems: Long, fpp: Double,
      maxShardBytes: Long, maxTotalBytes: Long): Option[ShardedBloom] =
    if (optimalBits(math.max(expectedItems, 1L), fpp) > 8 * maxTotalBytes)
      None
    else Some(buildSharded(hashes, hashCol, expectedItems, fpp,
      maxShardBytes))
}
