package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the claim the skew docs make (`ops/Skew.scala`): for JOIN skew,
  * AQE's runtime splitting is the first line of defense — a hot key's
  * oversized shuffle partition is split into parallel subtasks at
  * execution time (salting is for aggregation skew and stats-blind
  * planners). The spec synthesizes one hot key, forces a sort-merge
  * join, and asserts the executed plan carries the skew=true marker. */
class AqeSkewJoinSpec extends SparkTestBase {

  test("AQE splits the hot key's partition in a skewed SMJ") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows on key 0, one row each on keys 1..99; payload pads
      // the hot partition past the skew threshold
      val fact = spark.range(200000)
        .select(lit(0L).as("k"), concat(lit("x" * 64),
          col("id").cast("string")).as("payload"))
        .union(spark.range(1, 100).select(col("id").as("k"),
          lit("y").as("payload")))
      val dim = spark.range(100).select(col("id").as("k"),
        (col("id") * 10).as("v"))
      // referencing payload in the aggregate keeps it un-pruned, so the
      // hot key's shuffle partition is genuinely oversized
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("sp"))
      val row = joined.collect().head
      assert(row.getLong(0) === 200000L + 99L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
