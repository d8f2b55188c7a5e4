package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the incremental snapshot-maintenance queries beyond the
  * driver's hash gate (which already proves merge ≡ full recompute for
  * `incr_agg` — its oracle IS the full-scan aggregate).
  *
  *  - the HLL sketch-state merge must equal a single-pass sketch over
  *    the union (mergeability is the entire point of persisting sketch
  *    state; the driver's tolerance boolean alone would pass a merge
  *    that loses precision but stays inside 5%);
  *  - the delta scan of `incr_agg` must push its snapshot predicate into
  *    the parquet scan (the refresh-cost claim rests on it).
  */
class IncrSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("merged sketch state equals the single-pass sketch estimate") {
    val ev = Tables.events(spark, sf)
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val merged = sk(ev.where(dayofmonth(col("ts")) < 16))
      .unionByName(sk(ev.where(dayofmonth(col("ts")) >= 16)))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val onePass = sk(ev)
      .select(col("event_type"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === onePass,
      "state-merge estimate drifted from the single-pass sketch — " +
        "the persisted-state path is not lossless vs one-shot")
  }

  test("windowed 7-day sketch merge equals the direct 7-day sketch") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val rolled = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .withColumn("day_num", unix_date(col("day")))
      .select(col("day"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))
          .over(Window.orderBy(col("day_num")).rangeBetween(-6, 0)))
          .as("est"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // direct: one sketch straight over each day's trailing-7 raw span
    val days = rolled.keys.toSeq.sorted
    days.foreach { d =>
      val direct = ev.where(col("day")
        .between(date_sub(lit(d), 6), lit(d)))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("user_id"), lit(14))).as("est"))
        .collect()(0).getLong(0)
      assert(rolled(d) === direct,
        s"day $d: windowed state-merge $rolled(d) != direct $direct")
    }
  }

  test("rolling window is calendar-correct across gap days") {
    import spark.implicits._
    // days 1, 2, then a 7-day gap, then day 10: the trailing-7-day
    // window at day 10 covers days 4..10 = ONLY day 10. A ROWS(-6,0)
    // window would merge the three present days and claim 3 users.
    val ev = Seq(("2024-01-01", 1L), ("2024-01-02", 2L),
        ("2024-01-10", 3L))
      .toDF("d", "user_id")
      .select(to_date(col("d")).as("day"), col("user_id"))
    val est = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .withColumn("day_num", unix_date(col("day")))
      .select(col("day").cast("string").as("day"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))
          .over(org.apache.spark.sql.expressions.Window
            .orderBy(col("day_num")).rangeBetween(-6, 0))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("2024-01-10") === 1L,
      "gap-day window must cover calendar days, not state rows")
    assert(est("2024-01-02") === 2L)
  }

  test("incr_agg delta predicate reaches the parquet scan") {
    val plan = Tables.orders(spark, sf)
      .where(year(col("o_orderdate")) >= 1999)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    // year(ts) itself isn't a pushable predicate shape, but the filter
    // must at least sit directly on the scan (no shuffle before it);
    // assert the Filter appears below the first Exchange.
    val filterIdx = plan.indexOf("Filter")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(filterIdx >= 0 && exchangeIdx >= 0 && filterIdx > exchangeIdx,
      s"expected scan-side Filter under the Exchange in:\n$plan")
  }

  test("warehouse_refresh gate: clean delta passes, dirty delta fails") {
    val clean = graft.SparkEntry.queries("warehouse_refresh")(spark, sf)
      .collect()
    assert(clean.nonEmpty && clean.forall(_.getBoolean(3)),
      "clean delta must publish with gate_ok=true")
    // poison one delta row (duplicate PK) and re-run the gate alone
    val orders = Tables.orders(spark, sf)
    val delta = orders.where(year(col("o_orderdate")) >= 1999)
    val dirty = delta.unionByName(delta.limit(1))
    val gate = CorpusQueries
      .constraintReport(dirty, Tables.customer(spark, sf))
      .agg(sum(when(col("ok"), 0).otherwise(1)).as("violations"))
      .collect()(0).getLong(0)
    assert(gate > 0, "a duplicated delta PK must trip the gate")
  }

  test("incr_agg output equals the monolithic groupBy frame exactly") {
    val incr = graft.SparkEntry.queries("incr_agg")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(14, 2)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2)).as("s"))
      .select(col("o_orderpriority"), col("cnt"),
        col("s").cast("double").as("sum_total"),
        (col("s").cast("double") / col("cnt").cast("double"))
          .as("avg_total"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(incr === full)
  }
}
