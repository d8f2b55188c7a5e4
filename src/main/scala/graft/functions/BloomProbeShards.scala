package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-handle probe of a sharded history Bloom — the scale form
  * the literal [[BloomProbe.mightContainSharded]] documents: instead of
  * embedding every shard's byte array as a CASE-branch literal (plan
  * and per-stage task binary ~totalBytes, acceptable below the 1 GiB
  * ceiling), the shard table ships ONCE PER EXECUTOR as a Spark
  * broadcast and the expression carries only the handle — generated
  * code is one static call regardless of shard count or size (the
  * [[PqLut]] reference-object discipline, upgraded from task-closure
  * reference to true broadcast).
  *
  * Semantics are identical to the literal form and to the monolithic
  * probe: value routes to shard `pmod(value, nShards)` (floorMod — the
  * exact arithmetic `buildSharded` used to assign inserts), that
  * shard's `mightContainLong` answers, NULL in → NULL out. Shards
  * deserialize once per executor (a process-level cache keyed on the
  * broadcast id), not per task. `BloomDedupSpec` pins
  * broadcast ≡ literal on the same sharded sketch. */
case class BloomProbeShards(child: Expression,
    bcast: Broadcast[Array[Array[Byte]]]) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"bloom_probe_shards requires a LongType " +
            s"hash, got ${other.simpleString(100)}")
    }

  override def nullSafeEval(input: Any): Any =
    BloomProbeShards.probe(bcast, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcastRef = ctx.addReferenceObj("bloomShardsBcast", bcast,
      classOf[Broadcast[Array[Array[Byte]]]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomProbeShards.probe(" +
        s"(org.apache.spark.broadcast.Broadcast) $bcastRef, $v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomProbeShards = copy(child = newChild)

  override def prettyName: String = "bloom_probe_shards"
}

object BloomProbeShards {

  /** Executor-local deserialized-shard cache: one `BloomFilter[]` per
    * broadcast id per JVM, built on first probe — tasks share it, and a
    * re-used broadcast across queries pays deserialization once.
    * Values are SOFT references so the cache is heap-bounded by the
    * collector, not unbounded by session length: a retired sketch's
    * array (up to ~1 GiB) is reclaimable the moment no task holds it,
    * and each (re)build sweeps cleared entries so the ids of destroyed
    * broadcasts don't accumulate as map keys. A cleared entry merely
    * re-pays one deserialization on the next probe of a LIVE broadcast
    * — correctness never depends on residency. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    Long, java.lang.ref.SoftReference[Array[BloomFilter]]]()

  def probe(bcast: Broadcast[Array[Array[Byte]]], value: Long): Boolean = {
    var filters = {
      val ref = cache.get(bcast.id)
      if (ref == null) null else ref.get()
    }
    if (filters == null) {
      filters = bcast.value.map(bytes =>
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cache.put(bcast.id,
        new java.lang.ref.SoftReference[Array[BloomFilter]](filters))
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
    }
    val shard = java.lang.Math.floorMod(value, filters.length.toLong).toInt
    filters(shard).mightContainLong(value)
  }
}
