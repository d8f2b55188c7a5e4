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
}
