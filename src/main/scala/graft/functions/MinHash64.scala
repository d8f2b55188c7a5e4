package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass MinHash signature over a token array: `k` minima of
  * `k` seeded xxhash64 permutations, computed in a single traversal.
  *
  * WHY a custom Expression (SURVEY §2.11 preference order, same argument
  * as [[SimHash64]]): the built-in form is `k` independent
  * `array_min(transform(...))` folds — `k` array materializations and
  * `k` UTF8String re-reads per row. "Hash each token once per seed, track
  * all k minima simultaneously" can't be stated as one pass in the
  * DataFrame algebra. The md5-based family in `ops.DedupQueries` stays
  * the oracle-checked form (DuckDB can mirror md5); this is the
  * throughput kernel for the 100 TB path, bit-equal to the xxhash64
  * HOF composition (pinned by MinHashSpec). Measured vs the composition
  * over sf0.1 documents (`tools.MinHashBench`): ~1.9× at k=8, ~11× at
  * k=128 (0.44 s vs 4.79 s per pass) — the gap grows with k because the
  * composition materializes k intermediate arrays per row.
  *
  * Seed schedule matches the built-in composition `xxhash64(lit(i), tok)`
  * exactly: Spark folds multi-arg xxhash64 left-to-right starting at seed
  * 42, so permutation i's effective seed is `hash(i, 42)` and the token
  * hash is `hash(tok, hash(i, 42))`. Rows with no usable token yield all
  * NULL signature slots, matching `array_min` over an empty transform.
  */
case class MinHash64(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k > 0 && k <= 512 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 requires 0 < k <= 512, got $k")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash64 requires array<string>, got ${other.simpleString(100)}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHash64.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHash64.compute($arr, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)

  override def prettyName: String = "minhash64"
}

object MinHash64 {

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** Effective seeds replicating `xxhash64(lit(i.toLong), tok)`:
    * seed_i = xxhash64(i, 42). */
  private def seedsFor(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, { kk =>
      Array.tabulate(kk)(i =>
        XxHash64Function.hash(i.toLong, LongType, 42L))
    })

  /** One-pass kernel: shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val seeds = seedsFor(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val tok = arr.getUTF8String(i)
        var s = 0
        while (s < k) {
          val h = XxHash64Function.hash(tok, StringType, seeds(s))
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  /** Column API entry point. */
  def minhash64(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinHash64(Bridge.expression(tokens), k))
  }

  /** SQL registration: `minhash64(arr, k)` with a literal int k. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash64", exprs => MinHash64(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
}
