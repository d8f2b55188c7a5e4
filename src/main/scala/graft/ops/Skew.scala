package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.3 "salting strategy documented for
  * skewed FILING_ID-like keys"). CAL-ACCESS-shaped data is Zipfian: a few
  * committees file millions of itemizations, so a plain groupBy/join on
  * FILING_ID sends whole hot keys to single tasks.
  *
  * Two standard remedies, both pure DataFrame ops:
  *
  *  - `saltedAggregate`: two-phase aggregation — first over
  *    (key, random-salt) so hot keys split across `salts` tasks, then the
  *    partial results (|keys|×salts rows, tiny) combine. Works for any
  *    associative agg set.
  *  - `saltedJoin`: skewed-side rows get a random salt; the small side is
  *    exploded ×salts so every (key, salt) partner exists. Converts one
  *    hot partition into `salts` even ones at the cost of duplicating the
  *    small side `salts` times — the right trade when the small side fits
  *    comfortably but isn't broadcastable.
  *
  * AQE's skew-join splitting handles most cases automatically
  * (spark.sql.adaptive.skewJoin, on by default); these are for when the
  * skew is in an aggregation (AQE doesn't split those) or the planner
  * lacks runtime stats.
  */
object Skew {

  /** Deterministic salt: hash of `saltOn` (or, when empty, a
    * per-partition row counter), mod `salts`. A rand()-based salt marks
    * the stage INDETERMINATE — a lost map output then forces
    * whole-stage rollback (and any mixed old/new fetch corrupts exact
    * aggregates), exactly the failure mode salting exists to survive at
    * 1000-executor scale. A deterministic salt makes every recomputed
    * task assign identical values, so single-task retry stays safe.
    * `saltOn` should be a FEW columns that vary within a hot key (a
    * line number, a transaction id) — hashing every column would both
    * pay per-row hash cost and drag unused columns through the scan,
    * defeating column pruning. The counter fallback
    * (monotonically_increasing_id, partition-local and
    * order-independent mod salts... strictly: stable only when input
    * partitioning is stable, which holds for file scans; callers with
    * a shuffled input should pass explicit saltOn) spreads even
    * fully-duplicate rows. */
  private def saltExpr(saltOn: Seq[Column], salts: Int): Column =
    if (saltOn.isEmpty)
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")
    else pmod(hash(saltOn: _*), lit(salts))

  /** Two-phase salted aggregation.
    * @param partials aggregations for phase 1 (must be associative-
    *                 decomposable with `finals`, e.g. count→sum)
    * @param finals   phase-2 recombination of the partial columns
    * @param saltOn   columns whose hash assigns the salt — pick a few
    *                 that vary within a hot key; empty → a stable
    *                 per-partition counter
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[Column], finals: Seq[Column],
      saltOn: Seq[Column] = Nil): DataFrame = {
    val salted = df.withColumn("__salt", saltExpr(saltOn, salts))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join: `skewed` joins `small` on `key`; the small side is
    * replicated across all salt values. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner",
      saltOn: Seq[Column] = Nil): DataFrame = {
    val saltedBig = skewed.withColumn("__salt", saltExpr(saltOn, salts))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedBig.join(explodedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
