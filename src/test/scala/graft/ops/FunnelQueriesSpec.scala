package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics pins for the event-sequence analytics beyond the DuckDB
  * hash gate. */
class FunnelQueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("funnel stages are ordered and monotonically non-increasing") {
    val rows = FunnelQueries.funnel.fn(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_signup", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    assert(counts(0) > 0)
  }

  test("funnel requires strict event order, not mere presence") {
    import spark.implicits._
    // user 1: signup then click (converts); user 2: click then signup
    // (click precedes entry — must NOT count at stage 2)
    val ev = Seq(
      (1L, "signup", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, "click", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")),
      (2L, "click", java.sql.Timestamp.valueOf("2024-01-01 09:00:00")),
      (2L, "signup", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")))
      .toDF("user_id", "event_type", "ts")
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    assert(s2.select("user_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("cohort retention: offset 0 holds the full cohort") {
    val out = FunnelQueries.cohortRetention.fn(spark, sf).cache()
    assert(out.filter(col("week_offset") < 0).count() === 0)
    // at offset 0 every cohort member is active (their first event is in
    // that week), so n_users at offset 0 is the max over the cohort row
    val perCohort = out.groupBy("cohort_wk")
      .agg(max(col("n_users")).as("mx"))
    val zeroRows = out.filter(col("week_offset") === 0)
      .select(col("cohort_wk"), col("n_users"))
    val joined = zeroRows.join(perCohort, "cohort_wk")
      .filter(col("n_users") =!= col("mx"))
    assert(joined.count() === 0)
    out.unpersist()
  }
}
