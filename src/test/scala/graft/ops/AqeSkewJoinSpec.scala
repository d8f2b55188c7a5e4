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

  test("whole-table salted latest-amendment join-back spreads the mega-chain by amend key") {
    // The 10⁷-logical-keys shape `Load.latestAmendmentSalted(
    // broadcastWinners = false)` documents: the winners frame is too big
    // to broadcast, so the join-back is a shuffle join. What makes that
    // safe at 100 TB is NOT AQE skew-splitting — it's that Catalyst
    // pushes the winner filter into the join condition, so the shuffle
    // hashes on (keys, amend counter) and a 10⁴-amendment mega-chain
    // spreads uniformly instead of funneling into one task. Pins
    // (a) broadcastWinners=false really suppresses the broadcast HINT
    // (an explicit broadcast() would force BHJ even with the threshold
    // at -1), (b) the amend counter IS a join key of the shuffle join —
    // the skew-immunity mechanism, (c) no partition is ever oversized
    // (AQE finds nothing to split even at aggressive thresholds), and
    // (d) semantics still equal the window form.
    import spark.implicits._
    import graft.schemas.Schemas
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one 20k-amendment mega-chain on filing 1, singleton chains on
      // 2..100; the padded memo makes a co-located chain oversized, so
      // if the chain ever co-located, AQE's skew marker would show
      val pad = "x" * 64
      val hot = spark.range(20000).select(
        lit(1L).as("filing_id"), col("id").as("amend_id"))
      val tail = spark.range(2, 101).select(
        col("id").as("filing_id"), lit(0L).as("amend_id"))
      val typed = hot.union(tail).select(
        col("filing_id"), col("amend_id"), lit(1L).as("line_item"),
        lit("RCPT").as("rec_type"), lit("A").as("form_type"),
        concat(lit("T"), col("filing_id")).as("tran_id"),
        concat(lit(pad), col("amend_id")).as("memo"))
      val salted = graft.ingest.Load.latestAmendmentSalted(Schemas.rcptCd,
        typed, broadcastWinners = false)
      val got = salted.collect()
      assert(got.length === 100)
      val finalPlan = salted.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("BroadcastHashJoin"),
        s"broadcastWinners=false must not hint a broadcast:\n$finalPlan")
      // a shuffle join whose LEFT key list carries the amend counter:
      // that key is what spreads the chain — losing it (e.g. by moving
      // the filter after a materialization barrier) would re-co-locate
      // whole chains and single-task the hot key
      assert("(SortMergeJoin|ShuffledHashJoin) \\[[^\\]]*amend_id".r
        .findFirstIn(finalPlan).nonEmpty, finalPlan)
      assert(!finalPlan.contains("skew=true"),
        s"no partition should be oversized once the chain spreads:\n$finalPlan")
      // winners identical to the window form on the same frame
      val window = graft.ingest.Load.latestAmendment(Schemas.rcptCd, typed)
        .collect().map(_.toSeq).toSet
      assert(got.map(_.toSeq.dropRight(1)).toSet === window)
      // and the lineage column counts every chain exactly
      val counts = got.map(r => (r.getLong(0),
        r.getLong(r.fieldIndex("n_amendments")))).toMap
      assert(counts(1L) === 20000L)
      assert((2L to 100L).forall(counts(_) === 1L))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
