package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out for expression-heavy narrow stages
  * (optimization guide §2: "make partitioning scale-adaptive — derive
  * from input size — rather than a constant").
  *
  * The driver's testdata tables are each ONE parquet file with ONE row
  * group, so every scan is a single task at any core count, and a
  * query whose cost is per-row expression work (tokenization, hashing,
  * shingling, decimal folds) runs single-core until its first
  * exchange. [[out]] redistributes rows to the session's default
  * parallelism ONLY in that planned-parallelism-starved case; on any
  * input that already fans out — every real deployment, where a table
  * is thousands of splits — it returns the frame UNTOUCHED, so no plan
  * gains an exchange at scale.
  *
  * Mechanics and discipline:
  *  - hash repartition on a real, stable column (caller-chosen key),
  *    never round-robin: deterministic row routing under task retry
  *    (guide §2.5 / SPARK-38388) and no sort-before-repartition pass;
  *  - callers apply it AFTER their scan-level filters, so PushedFilters
  *    still reach the parquet scan unchanged;
  *  - the planned parallelism probe reads the physical plan's partition
  *    count on the driver (no job runs).
  */
private[graft] object Fan {

  def out(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 2) return df
    // The probe below physically plans `df` and asks its RDD for the
    // partition count. On an EXCHANGE-FREE frame that is pure driver
    // work (scan split packing, no job); on a frame carrying exchanges,
    // `df.rdd` under AQE would EXECUTE the upstream shuffle stages to
    // materialize the final plan — a hidden job a helper must never
    // trigger. Callers pass scan+filter frames by contract; enforce it
    // structurally so a future caller fails loudly instead of silently
    // running stages (r20 advice item).
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.foreach {
      case n @ (_: Join | _: Aggregate | _: Window | _: Sort |
                _: RepartitionOperation) =>
        throw new IllegalArgumentException(
          "Fan.out: input must be an exchange-free scan/filter/project " +
            s"frame — found ${n.nodeName}; fan out BEFORE wide operators")
      case _ =>
    }
    val planned = df.rdd.getNumPartitions
    if (planned * 2 >= target) df
    else df.repartition(target, key)
  }
}
