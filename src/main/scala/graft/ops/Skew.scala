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

  /** Deterministic salt: hash of `saltOn` (or, when empty, of EVERY
    * input column), mod `salts`. A rand()-based salt marks the stage
    * INDETERMINATE — a lost map output then forces whole-stage rollback
    * (and any mixed old/new fetch corrupts exact aggregates), exactly
    * the failure mode salting exists to survive at 1000-executor scale;
    * a partition-counter salt (monotonically_increasing_id) is only
    * deterministic while the input partitioning is stable, which a
    * caller-supplied shuffled frame silently violates. Hashing is
    * deterministic row-by-row no matter how the input arrives. Prefer
    * explicit `saltOn`: a FEW columns that vary within a hot key (a
    * line number, a transaction id) — the all-columns fallback pays
    * per-row hash width and, on a frame wider than the query needs,
    * drags unpruned columns through the scan. Trade-offs of the
    * fallback: fully-duplicate rows share one salt bucket (correct,
    * just unspread — pass saltOn to split those), and it fails
    * analysis on frames carrying an unhashable column type (MapType is
    * not hashable in Spark) — both are reasons the fallback is a
    * convenience, not the recommended path: pass explicit saltOn. */
  private def saltExpr(saltOn: Seq[Column], salts: Int,
      allColumns: => Seq[Column]): Column = {
    val basis = if (saltOn.isEmpty) allColumns else saltOn
    pmod(hash(basis: _*), lit(salts))
  }

  /** Two-phase salted aggregation.
    * @param partials aggregations for phase 1 (must be associative-
    *                 decomposable with `finals`, e.g. count→sum)
    * @param finals   phase-2 recombination of the partial columns
    * @param saltOn   columns whose hash assigns the salt — pick a few
    *                 that vary within a hot key; empty → hash of every
    *                 input column (deterministic, see [[saltExpr]])
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[Column], finals: Seq[Column],
      saltOn: Seq[Column] = Nil): DataFrame = {
    val salted = df.withColumn("__salt",
      saltExpr(saltOn, salts, df.columns.toSeq.map(col)))
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
    val saltedBig = skewed.withColumn("__salt",
      saltExpr(saltOn, salts, skewed.columns.toSeq.map(col)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedBig.join(explodedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
