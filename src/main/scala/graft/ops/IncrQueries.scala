package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental snapshot maintenance + data-layout clustering.
  *
  * The reference's pipeline is a FULL monthly reload: every
  * `updatecalaccessrawdata` run (`management/commands/
  * updatecalaccessrawdata.py:~100-200`) re-downloads the complete
  * CAL-ACCESS export and rebuilds every table, and the verify/report
  * layer (`verifycalaccessrawdata.py:~40-90`) recomputes its counts from
  * scratch each time. That is affordable at ~10 GB; at 100 TB a full
  * rescan per refresh is the single biggest cost in the system. This
  * module adds the two standard industrial fixes, expressed so the
  * driver's hash gate PROVES them equivalent to the full recompute:
  *
  *  - ALGEBRAIC AGG STATE ([[incrAgg]]): per-group (count, decimal-sum)
  *    partials are mergeable — `state(old) ⊎ partial(delta)` re-aggregated
  *    equals the full-scan aggregate exactly. The oracle IS the full
  *    recompute over all rows, so a hash match is a proof of the merge
  *    identity, not a spot check.
  *  - SKETCH STATE ([[incrDistinct]]): COUNT(DISTINCT) is NOT algebraic —
  *    exact incrementality would mean persisting every key ever seen.
  *    The mergeable substitute is an HLL sketch per group
  *    (`hll_sketch_agg` → `hll_union_agg`, Apache DataSketches, fixed
  *    bytes per group); verified with the exact-anchor + tolerance-boolean
  *    pattern established by `agg_approx_distinct`.
  *
  * [[zorderLayout]] is the read-side counterpart: once a table is
  * maintained in place rather than rebuilt, its FILE LAYOUT is the main
  * remaining lever. Z-order interleaving maps a 2-D predicate space onto
  * the 1-D range-partitioning key so parquet min/max footer stats prune
  * on BOTH dimensions at once — the standard layout optimization for
  * multi-dimensional point/range lookups at warehouse scale.
  *
  * Scale notes: every query here shuffles |groups| rows (the partials /
  * sketches), never |input|; the delta scan prunes to the delta partition
  * by predicate pushdown; no driver-side state beyond the plan.
  */
object IncrQueries {

  private def money(c: Column): Column = c.cast(DecimalType(14, 2))

  /** Snapshot split: the already-loaded history vs. the fresh delta.
    * Year-based so DuckDB applies the identical predicate; in production
    * this is the load-version partition column (`models/tracking.py:~150`
    * release grain). */
  private val splitYear = 1999

  /** The shared algebraic state shape of [[incrAgg]] and
    * [[warehouseRefresh]]: per-priority (count, exact decimal sum)
    * partials, and their state ⊎ delta merge — ONE definition so the
    * two registry entries that both claim "merge ≡ full recompute"
    * can never drift apart on the decimal discipline or group key. */
  private def priorityPartial(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(money(col("o_totalprice")))
          .cast(DecimalType(38, 2)).as("sum_dec"))

  private def mergeState(state: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    state.unionByName(delta)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_dec")).cast(DecimalType(38, 2)).as("sum_dec"))

  /** Incremental algebraic aggregate maintenance: merged per-group
    * (count, sum) state over [history ⊎ delta] == full recompute.
    *
    * `state` stands in for the persisted per-group partials of the last
    * run (in production: a tiny parquet table keyed by group); `deltaPart`
    * scans ONLY delta rows — the filter pushes into the parquet scan, so
    * a refresh touches new data + |groups| state rows, never the history.
    * The merge is a unionByName of two |groups|-sized frames and one hash
    * aggregation — free at any scale.
    *
    * Decimal discipline per AggQueries: partial sums are DECIMAL(38,2)
    * (exact, order-independent, overflow-safe through the second SUM);
    * the double cast and the sum/count division happen once in the final
    * projection, matching the oracle's arithmetic exactly. */
  val incrAgg = GQuery(
    "incr_agg",
    (s, d) => {
      val orders = Tables.orders(s, d)
      mergeState(
        priorityPartial(orders.where(year(col("o_orderdate")) < splitYear)),
        priorityPartial(orders.where(year(col("o_orderdate")) >= splitYear)))
        .select(
          col("o_orderpriority"),
          col("cnt"),
          col("sum_dec").cast(DoubleType).as("sum_total"),
          (col("sum_dec").cast(DoubleType) / col("cnt").cast(DoubleType))
            .as("avg_total"))
        .transform(Out.boundedSort(_, col("o_orderpriority")))
    },
    // The oracle is the FULL-SCAN aggregate — a hash match proves the
    // incremental merge reproduces it bit-for-bit.
    Some("""
      SELECT o_orderpriority,
             COUNT(*) AS cnt,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_total,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_total
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  /** Incremental COUNT DISTINCT via mergeable HLL sketch state.
    *
    * History and delta each aggregate to one DataSketches HLL sketch per
    * group (`hll_sketch_agg`, lgConfigK=14 → ~0.8% rsd, 16 KB cap per
    * group); the refresh unions the two |groups|-row sketch frames and
    * merges with `hll_union_agg` — the persisted-state shape that makes
    * distinct-cardinality maintenance O(groups), not O(keys ever seen).
    *
    * Verification follows the `agg_approx_distinct` anchor pattern: the
    * row is hash-anchored by the exact per-group distinct count (which the
    * oracle recomputes), and the merged-sketch estimate is asserted into
    * a tolerance boolean the oracle pins TRUE. The exact side runs over
    * distinct (group, user) pairs — two map-side-combinable hash aggs, no
    * Expand (see AggQueries A5b plan note). */
  val incrDistinct = GQuery(
    "incr_distinct",
    (s, d) => {
      val ev = Tables.events(s, d).where(col("user_id").isNotNull)
      def sketch(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val stateSk = sketch(ev.where(dayofmonth(col("ts")) < 16))
      val deltaSk = sketch(ev.where(dayofmonth(col("ts")) >= 16))
      val merged = stateSk.unionByName(deltaSk)
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_users"))
      val exact = ev.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_users"))
      exact.join(merged, Seq("event_type"))
        .select(
          col("event_type"),
          col("exact_users"),
          (abs(col("est_users").cast(DoubleType) -
            col("exact_users").cast(DoubleType)) <=
            col("exact_users").cast(DoubleType) * 0.05)
            .as("approx_within_5pct"))
        .transform(Out.boundedSort(_, col("event_type")))
    },
    Some("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             TRUE AS approx_within_5pct
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type
    """))

  /** Rolling 7-day active users from per-day sketch state — the
    * incremental form of the classic WAU report.
    *
    * The exact computation needs, for every day, the distinct users over
    * a 7-day span — at scale that is either a 7× re-scan per day or a
    * range join of every event against every covering day. The sketch
    * form reduces the corpus ONCE to |days| HLL sketches (the persisted
    * per-day state — each new day appends one row), then merges 7
    * sketches per output row with `hll_union_agg` over a RANGE frame on
    * the epoch-day number (calendar-correct across gap days — see the
    * inline note).
    * Refresh cost: scan of the new day only; report cost: |days| rows.
    * The global (unpartitioned) window runs over the per-day STATE frame,
    * not the events — |days| rows by construction (36.5k rows for a
    * century), so the single-partition sort is intentional and bounded;
    * at larger day-grain cardinalities partition by calendar year and
    * seed each year with the prior year's last 6 sketches.
    *
    * Verification: the exact WAU anchors each row, computed with the
    * scale-safe shape (distinct (day, user) pairs range-joined against a
    * BROADCAST |days|-row calendar — the bounded side is broadcast, never
    * the pairs); the sketch estimate folds into the established tolerance
    * boolean, which the oracle (computing the identical exact range join)
    * pins TRUE. */
  val rollingWau = GQuery(
    "rolling_wau",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val perDay = ev.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      // RANGE frame over the epoch-day NUMBER, not ROWS over state rows:
      // with a gap day in the calendar, rowsBetween(-6, 0) would merge
      // the 7 most recent PRESENT days (reaching back 8+ calendar days)
      // and silently diverge from the trailing-7-CALENDAR-day contract
      // the exact anchor and the oracle compute.
      val rolled = perDay
        .withColumn("day_num", unix_date(col("day")))
        .withColumn(
          "est_wau",
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))
            .over(Window.orderBy(col("day_num")).rangeBetween(-6, 0))))
      val pairs = ev.distinct()
      val days = perDay.select(col("day").as("anchor_day"))
      val exact = pairs
        .join(broadcast(days),
          col("day").between(date_sub(col("anchor_day"), 6),
            col("anchor_day")))
        .groupBy(col("anchor_day"))
        .agg(countDistinct(col("user_id")).as("exact_wau"))
        .withColumnRenamed("anchor_day", "day")
      exact.join(rolled.select(col("day"), col("est_wau")), Seq("day"))
        .select(
          col("day"),
          col("exact_wau"),
          (abs(col("est_wau").cast(DoubleType) -
            col("exact_wau").cast(DoubleType)) <=
            col("exact_wau").cast(DoubleType) * 0.05)
            .as("approx_within_5pct"))
        .transform(Out.boundedSort(_, col("day")))
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS anchor_day FROM events
      )
      SELECT d.anchor_day AS day,
             COUNT(DISTINCT e.user_id) AS exact_wau,
             TRUE AS approx_within_5pct
      FROM days d
      JOIN events e
        ON CAST(e.ts AS DATE) BETWEEN d.anchor_day - 6 AND d.anchor_day
      GROUP BY d.anchor_day
      ORDER BY day
    """))

  /** Incremental TOP-K maintenance — the third mergeable state kind
    * after algebraic sums ([[incrAgg]]) and sketches ([[incrDistinct]]):
    * a per-group top-k list is a monoid (merge = concat → re-rank →
    * truncate), so the refresh keeps k rows per group as state and
    * folds in the delta's top-k without ever rescanning history. The
    * identity is EXACT (unlike sketches): top-k(old ⊎ delta) =
    * top-k(top-k(old) ⊎ top-k(delta)), because a row outside its
    * side's top-k cannot enter the merged top-k. The oracle recomputes
    * the full-scan top-k, so the hash match proves that identity.
    *
    * Per-side top-k goes through a partitioned window (WindowGroupLimit
    * pushes the limit into the sort — no global sort); the merge ranks
    * 2k rows per group. Ties break on the PK so the result is total. */
  val incrTopk = GQuery(
    "incr_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      def topk(df: org.apache.spark.sql.DataFrame) =
        df.select(col("o_orderpriority"), col("o_orderkey"),
            col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5).drop("rn")
      val state = topk(orders.where(year(col("o_orderdate")) < splitYear))
      val delta = topk(orders.where(year(col("o_orderdate")) >= splitYear))
      state.unionByName(delta)
        .withColumn("rnk", row_number().over(w).cast(LongType))
        .where(col("rnk") <= 5)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"))
        .transform(Out.boundedSort(_, col("o_orderpriority"), col("rnk")))
    },
    Some("""
      SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
      FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        FROM orders)
      WHERE rnk <= 5
      ORDER BY o_orderpriority, rnk
    """))

  /** Audience overlap between every pair of event types from SKETCH
    * ALGEBRA: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), with the union
    * estimated by `hll_union` of the two per-group sketches — the
    * donor-overlap / audience-overlap report shape (reference analog:
    * which committees share contributors — `rcpt_cd` linkage), computed
    * WITHOUT touching row-level data twice. One corpus pass builds
    * |groups| sketches; the pair report is a |groups|² self-join of
    * 1-row-per-group state — free at any corpus size (5 groups here;
    * even 10⁴ groups is a 10⁸-row joined frame of fixed-size sketches,
    * still corpus-independent).
    *
    * Inclusion–exclusion compounds three estimator errors, so the
    * tolerance is ±10% of the exact intersection (vs 5% single-sketch):
    * still far tighter than the rsd bound at lgK=14. Exact anchor: the
    * distinct-pairs equi-join both engines compute identically. */
  val overlapSketch = GQuery(
    "overlap_sketch",
    (s, d) => {
      val pairs = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
      val sk = pairs.groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
          count(lit(1)).as("n"))
      val a = sk.select(col("event_type").as("type_a"),
        col("sk").as("sk_a"), col("n").as("n_a"))
      val b = sk.select(col("event_type").as("type_b"),
        col("sk").as("sk_b"), col("n").as("n_b"))
      val est = a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          (hll_sketch_estimate(col("sk_a")) +
            hll_sketch_estimate(col("sk_b")) -
            hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
            .as("est_overlap"))
      val exact = pairs.as("x")
        .join(pairs.withColumnRenamed("event_type", "type_b").as("y"),
          Seq("user_id"))
        .where(col("event_type") < col("type_b"))
        .groupBy(col("event_type").as("type_a"), col("type_b"))
        .agg(count(lit(1)).as("exact_overlap"))
      exact.join(est, Seq("type_a", "type_b"))
        .select(col("type_a"), col("type_b"), col("exact_overlap"),
          (abs(col("est_overlap").cast(DoubleType) -
            col("exact_overlap").cast(DoubleType)) <=
            col("exact_overlap").cast(DoubleType) * 0.10)
            .as("approx_within_10pct"))
        .transform(Out.boundedSort(_, col("type_a"), col("type_b")))
    },
    Some("""
      WITH pairs AS (
        SELECT DISTINCT event_type, user_id FROM events),
      x AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS exact_overlap
        FROM pairs a JOIN pairs b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, exact_overlap,
             TRUE AS approx_within_10pct
      FROM x
      ORDER BY type_a, type_b
    """))

  /** Bits per dimension for the z-curve; 8+8 → a 16-bit z-value whose
    * high byte identifies a 16×16 tile of the (x, y) plane. Public so
    * [[graft.sinks.PartitionedSink.compactZOrdered]] can enforce the
    * [0, 2^zBits) input domain its guard documents. */
  val zBits = 8

  /** Z-value: bit-interleave two `zBits`-bit dimensions, x in the odd
    * positions, y in the even — composed entirely from codegen'd builtin
    * shifts/masks (constant-folded per bit), so the whole computation
    * stays inside WholeStageCodegen and is portable to the oracle as the
    * identical 2·zBits-term integer expression. */
  def zvalue(x: Column, y: Column): Column =
    (0 until zBits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1)), 2 * b + 1)
        .bitwiseOR(
          shiftleft(shiftright(y, b).bitwiseAND(lit(1)), 2 * b))
    }.reduce(_ bitwiseOR _)

  /** The same z-value as ANSI SQL for the DuckDB oracle — generated from
    * the same bit list so the two sides can never drift. */
  private[ops] def zvalueSql(x: String, y: String): String =
    (0 until zBits).map { b =>
      s"(((($x >> $b) & 1) << ${2 * b + 1}) | ((($y >> $b) & 1) << ${2 * b}))"
    }.mkString("(", " | ", ")")

  /** Z-order layout clustering: map (customer, order-age) onto the
    * z-curve and report the bounding box of every 16×16 z-tile.
    *
    * The 100 TB story: a table range-partitioned/sorted by `z` gives each
    * parquet file a CONTIGUOUS z-range, and a contiguous z-range covers a
    * small axis-aligned region of the (x, y) plane — so the file's
    * min/max footer stats are tight on BOTH x and y, and a predicate on
    * either dimension (or both) skips all but a few files. A single-column
    * sort gives tight stats on one dimension and useless full-span stats
    * on the other. The query output makes the property driver-checkable:
    * every tile's x/y span is ≤ 15 (tile width 16), which the oracle
    * verifies by recomputing the identical interleave arithmetic.
    * `ZOrderSpec` additionally pins the physical claim at the partition
    * level: after repartitionByRange(z), per-partition x/y spans stay
    * tile-sized while a hash layout's span the full domain. */
  val zorderLayout = GQuery(
    "zorder_layout",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val x = pmod(col("o_custkey"), lit(1 << zBits)).cast(IntegerType)
      // order age in ~10-day resolution: 1995..2001 → 0..~240, inside 8 bits
      val y = floor(
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          / 10).cast(IntegerType)
      orders
        .select(x.as("x"), y.as("y"))
        .select(col("x"), col("y"),
          shiftright(zvalue(col("x"), col("y")), zBits).as("ztile"))
        .groupBy(col("ztile"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .transform(Out.boundedSort(_, col("ztile")))
    },
    Some(s"""
      WITH pts AS (
        SELECT CAST(o_custkey % ${1 << zBits} AS INTEGER) AS x,
               CAST(FLOOR(date_diff('day', DATE '1995-01-01',
                 CAST(o_orderdate AS DATE)) / 10) AS INTEGER) AS y
        FROM orders
      ), zv AS (
        SELECT x, y, ${zvalueSql("x", "y")} >> $zBits AS ztile FROM pts
      )
      SELECT ztile, COUNT(*) AS cnt,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y
      FROM zv
      GROUP BY ztile
      ORDER BY ztile
    """))

  /** The composed refresh lifecycle — what replaces the reference's
    * monthly full reload (`updatecalaccessrawdata.py:~100-200`) at
    * warehouse scale, END-TO-END as one driver-verified query:
    *
    *   1. GATE: the delta snapshot must pass the declarative constraint
    *      suite ([[CorpusQueries.constraintReport]]) before anything
    *      merges — the dbt-test-before-publish discipline. The gate
    *      verdict (AND of all constraints) rides on every output row,
    *      and the oracle asserts it TRUE, so a dirty delta fails the
    *      driver's hash gate loudly.
    *   2. MERGE: per-group algebraic state ⊎ delta partials
    *      (the [[incrAgg]] identity — the oracle recomputes from the
    *      full table, proving the merge).
    *   3. PUBLISH: the merged per-group aggregate report.
    *
    * Cost shape: delta scan + |groups| state rows + one broadcast
    * anti-join; the history is never rescanned. */
  val warehouseRefresh = GQuery(
    "warehouse_refresh",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val delta = orders.where(year(col("o_orderdate")) >= splitYear)
      val gateOk = CorpusQueries
        .constraintReport(delta, Tables.customer(s, d))
        .agg((coalesce(sum(when(col("ok"), 0).otherwise(1)), lit(0L))
          === 0).as("gate_ok"))
      mergeState(
        priorityPartial(orders.where(year(col("o_orderdate")) < splitYear)),
        priorityPartial(delta))
        .crossJoin(broadcast(gateOk))
        .select(
          col("o_orderpriority"),
          col("cnt"),
          col("sum_dec").cast(DoubleType).as("sum_total"),
          col("gate_ok"))
        .transform(Out.boundedSort(_, col("o_orderpriority")))
    },
    Some("""
      SELECT o_orderpriority,
             COUNT(*) AS cnt,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_total,
             TRUE AS gate_ok
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  /** The composed incremental pipeline with REDELIVERY — what
    * [[warehouseRefresh]] becomes once the delta arrives over an
    * at-least-once transport (a crawler re-sending, a queue replaying):
    * the batch driver-verified form of the per-micro-batch body
    * `graft.streaming.StreamRunner.incrRefreshStream` runs (same three
    * stages, same order; the streaming form adds the batch-id-keyed
    * idempotent state write, restart-pinned in `IncrPipelineSpec`).
    *
    *   1. BLOOM DEDUP: the delta is the true delta PLUS a 1-in-7
    *      re-delivery of history rows. History PKs build one bit array
    *      (driver-held, `dedup_bloom` shape); every delta row probes it
    *      map-side; ONLY bloom-positives pay the exact anti-join
    *      against history keys. No false negatives (Bloom guarantee) →
    *      every redelivered row drops; exact verify of positives →
    *      no fresh row is lost to an fpp collision.
    *   2. GATE: the deduped delta passes the declarative constraint
    *      suite; the verdict rides every row.
    *   3. MERGE: per-group algebraic state ⊎ deduped-delta partials.
    *
    * The oracle is the FULL-SCAN aggregate over the clean table — so
    * the hash match PROVES the dedup dropped exactly the redelivered
    * set (one missed redelivery double-counts a group; one false-drop
    * under-counts it; either flips the hash). Scale shape: history
    * never rescanned at batch width — its bit array broadcasts, its
    * key column joins only the ~|redelivered| + fpp positives. The
    * history sketch builds ONCE PER PROCESS (the `savedIvfPath`
    * discipline): in deployment it is persisted refresh state updated
    * as history grows, not rebuilt per delta — so bench reps time the
    * refresh, while `dedup_bloom` stays the designated cold
    * sketch-build timing entry. */
  /** History sketch as a hash-range-SHARDED Bloom behind a documented
    * size ceiling (round-12 verdict "what's wrong" #1): shards bound
    * every allocation unit (build-task memory, probe-branch literal) to
    * 8 MiB, and past a 1 GiB total budget — ~8×10⁸ keys at 1% fpp —
    * the build returns None and the pipeline sends EVERY delta row
    * through the exact anti-join instead (identical results; the Bloom
    * is only ever a work-shrinking pre-filter). At test scale this
    * degenerates to one shard with the same inserted bits as before. */
  private val histBloom = scala.collection.concurrent.TrieMap
    .empty[String, Option[graft.functions.BloomProbe.ShardedBloom]]

  private def historyBloomFor(history: org.apache.spark.sql.DataFrame,
      d: String): Option[graft.functions.BloomProbe.ShardedBloom] =
    graft.BuildOnce.memo(histBloom, d) {
      val nHist = math.max(history.count(), 1L)
      graft.functions.BloomProbe.shardedOrNone(
        history.select(xxhash64(col("o_orderkey")).as("h")), "h",
        nHist, 0.01, maxShardBytes = 8L << 20, maxTotalBytes = 1L << 30)
    }

  val incrPipeline = GQuery(
    "incr_pipeline",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val history = orders.where(year(col("o_orderdate")) < splitYear)
      val freshDelta = orders.where(year(col("o_orderdate")) >= splitYear)
      val redelivered = history.where(col("o_orderkey") % 7 === 0)
      val delta = freshDelta.unionByName(redelivered)
      val probe = historyBloomFor(history, d)
        .map(sb => graft.functions.BloomProbe.mightContainSharded(sb,
          xxhash64(col("o_orderkey"))))
        // past the sketch ceiling: every row "maybe" seen → the whole
        // delta takes the exact anti-join, nothing is lost
        .getOrElse(lit(true))
      val probed = delta.withColumn("_maybe",
        coalesce(probe, lit(false)))
      // r20 §5: the deduped delta feeds FOUR downstream subtrees (the
      // five-constraint gate scans it three ways, the merge partial
      // once) — materialize it once per batch instead of re-running
      // the bloom probe + exact anti-join per subtree. This is also
      // the deployment shape: the streaming form's idempotent state
      // write materializes the deduped batch anyway.
      val fresh = probed.filter(!col("_maybe"))
        .unionByName(probed.filter(col("_maybe"))
          .join(history.select(col("o_orderkey")), Seq("o_orderkey"),
            "left_anti"))
        .drop("_maybe")
        .localCheckpoint(true)
      val gateOk = CorpusQueries
        .constraintReport(fresh, Tables.customer(s, d))
        .agg((coalesce(sum(when(col("ok"), 0).otherwise(1)), lit(0L))
          === 0).as("gate_ok"))
      mergeState(priorityPartial(history), priorityPartial(fresh))
        .crossJoin(broadcast(gateOk))
        .select(
          col("o_orderpriority"),
          col("cnt"),
          col("sum_dec").cast(DoubleType).as("sum_total"),
          col("gate_ok"))
        .transform(Out.boundedSort(_, col("o_orderpriority")))
    },
    Some("""
      SELECT o_orderpriority,
             COUNT(*) AS cnt,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_total,
             TRUE AS gate_ok
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  /** Dedicated base-table copy + registered materialized view for the
    * rewrite entry — a COPY so no other registry query's plan can be
    * touched by the registration (the rule keys on the scanned path).
    * Built and registered once per process. */
  private val mvSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvBasePath(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.BuildOnce.memo(mvSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mv_base_$tag"
      val mv = s"${graft.GraftSession.scratchDir}/mv_view_$tag"
      Tables.lineitem(s, d)
        .select("l_quantity", "l_returnflag", "l_linestatus")
        .write.mode("overwrite").parquet(base)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_p"),
          count(lit(1)).as("cnt_p"),
          min(col("l_quantity")).as("min_qty_p"),
          max(col("l_quantity")).as("max_qty_p"))
        .write.mode("overwrite").parquet(mv)
      graft.plans.MatView.register(graft.plans.MatView.MvDef(base, mv,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity",
            Some(DecimalType(38, 2)), "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"),
          graft.plans.MatView.AggSpec("min", "l_quantity", None,
            "min_qty_p"),
          graft.plans.MatView.AggSpec("max", "l_quantity", None,
            "max_qty_p"))))
      base
    }

  /** Materialized-view rewrite, driver-verified: the query is WRITTEN
    * against the base fact table, the custom Catalyst rule
    * ([[graft.plans.MatView.MvRewrite]], installed via
    * `spark.sql.extensions`) re-plans it onto the registered rollup
    * view — `MatViewSpec` pins that the executed plan scans ONLY the
    * view — and the oracle computes the same aggregate from the RAW
    * table, so the hash match proves the rewrite is semantics-
    * preserving (decimal partials make partial-of-partials exact).
    * This is the warehouse dashboard-rollup path: at 100 TB the query
    * reads |group cells| rows instead of the fact table. */
  val mvRewrite = GQuery(
    "mv_rewrite",
    (s, d) => {
      val base = savedMvBasePath(s, d)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .select(col("l_returnflag"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"), col("min_qty"), col("max_qty"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(l_quantity) AS min_qty,
             MAX(l_quantity) AS max_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** Base copy built on the EVEN half, view registered, then the odd
    * half appended to the base AND merged into the view through
    * [[graft.plans.MatView.refresh]] — the grown-warehouse state
    * `mv_refresh` queries. */
  private val mvRefreshSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvRefreshPath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvRefreshSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mvr_base_$tag"
      val mv = s"${graft.GraftSession.scratchDir}/mvr_view_$tag"
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_returnflag",
          "l_linestatus")
      li.where(col("l_orderkey") % 2 === 0)
        .write.mode("overwrite").parquet(base)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_p"),
          count(lit(1)).as("cnt_p"),
          min(col("l_quantity")).as("min_qty_p"),
          max(col("l_quantity")).as("max_qty_p"))
        .write.mode("overwrite").parquet(mv)
      graft.plans.MatView.register(graft.plans.MatView.MvDef(base, mv,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity",
            Some(DecimalType(38, 2)), "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"),
          graft.plans.MatView.AggSpec("min", "l_quantity", None,
            "min_qty_p"),
          graft.plans.MatView.AggSpec("max", "l_quantity", None,
            "max_qty_p"))))
      val delta = li.where(col("l_orderkey") % 2 === 1)
        .localCheckpoint(true)
      delta.write.mode("append").parquet(base)
      graft.plans.MatView.refresh(s, base, delta)
      base
    }

  /** Incremental view maintenance, driver-verified end to end: the
    * warehouse grows by a delta batch, the view merges the delta's
    * partials algebraically (∝ |delta| — the base is never rescanned),
    * and the rollup query — rewritten onto the REFRESHED view by the
    * same Catalyst rule — must hash-match the from-scratch aggregate
    * over the whole grown table. refresh ≡ rebuild, through the
    * rewrite path, in one gate. */
  val mvRefresh = GQuery(
    "mv_refresh",
    (s, d) => {
      val base = savedMvRefreshPath(s, d)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .select(col("l_returnflag"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"), col("min_qty"), col("max_qty"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    mvRewrite.oracle)

  /** The dashboard shape with a WHERE clause: a grouping-column
    * predicate only selects whole groups, so it commutes with the
    * aggregation and the Catalyst rule serves it from the VIEW with the
    * filter applied to view rows (row-level predicates correctly fall
    * back to the base scan — `MatViewSpec` pins both directions). The
    * oracle recomputes from the raw table with the same predicate, so
    * the hash match certifies the filter-through-view algebra. */
  val mvRewriteFiltered = GQuery(
    "mv_rewrite_filtered",
    (s, d) => {
      val base = savedMvBasePath(s, d)
      graft.Pq.read(s, base)
        .where(col("l_returnflag").isin("A", "N"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE l_returnflag IN ('A', 'N')
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** Dedicated base copy + view with the AVG-covering partials: an
    * UNCAST sum (same double addition the one-pass Average buffer
    * performs) plus the COUNT(col) non-null count, and COUNT(*) for
    * the row-count output. Separate from [[savedMvBasePath]] so the
    * registration cannot change which view answers `mv_rewrite`. */
  private val mvAvgSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvAvgBasePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvAvgSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mva_base_$tag"
      val mv = s"${graft.GraftSession.scratchDir}/mva_view_$tag"
      Tables.lineitem(s, d)
        .select("l_quantity", "l_returnflag", "l_linestatus")
        .write.mode("overwrite").parquet(base)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty_p"),
          count(col("l_quantity")).as("cntq_p"),
          count(lit(1)).as("cnt_p"))
        .write.mode("overwrite").parquet(mv)
      graft.plans.MatView.register(graft.plans.MatView.MvDef(base, mv,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity", None,
            "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "l_quantity", None,
            "cntq_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"))))
      base
    }

  /** AVG through the materialized view: the Catalyst rule decomposes
    * AVG(x) into SUM(sum_partial) / SUM(count_col_partial) — the
    * derived-measure rewrite every warehouse needs, since dashboards
    * ask for averages but views can only store partials (an avg of
    * avgs is wrong under unequal cell sizes; the sum/count
    * decomposition is the correct algebra). Oracle = DuckDB's AVG over
    * the raw table; integral l_quantity keeps both engines' double
    * sums exact, so the hash match is bit-for-bit. */
  val mvRewriteAvg = GQuery(
    "mv_rewrite_avg",
    (s, d) => {
      val base = savedMvAvgBasePath(s, d)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("avg_qty"),
          count(col("l_quantity")).as("n_vals"),
          count(lit(1)).as("n_rows"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    Some("""
      SELECT l_returnflag,
             AVG(l_quantity) AS avg_qty,
             CAST(COUNT(l_quantity) AS BIGINT) AS n_vals,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** Base copy + sum/count view (NO min/max — those partials refuse
    * deletes), then a takedown slice removed from BOTH the base table
    * and the view via [[graft.plans.MatView.refreshDelete]]'s negated
    * partials. */
  private val mvDelSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvDeletePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvDelSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mvd_base_$tag"
      val mv = s"${graft.GraftSession.scratchDir}/mvd_view_$tag"
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_returnflag",
          "l_linestatus")
      li.write.mode("overwrite").parquet(base)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_p"),
          count(lit(1)).as("cnt_p"))
        .write.mode("overwrite").parquet(mv)
      graft.plans.MatView.register(graft.plans.MatView.MvDef(base, mv,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity",
            Some(DecimalType(38, 2)), "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"))))
      // the takedown: materialize the doomed rows BEFORE rewriting the
      // base they're computed from (the lazy-segment trap), shrink the
      // base, negative-merge the view
      val doomed = graft.Pq.read(s, base)
        .where(col("l_orderkey") % 3 === 0)
        .localCheckpoint(true)
      graft.ops.Layout.replaceDir(s,
        graft.Pq.read(s, base).where(col("l_orderkey") % 3 =!= 0), base)
      graft.plans.MatView.refreshDelete(s, base, doomed)
      base
    }

  /** Delete-side view maintenance, driver-verified end to end: a slice
    * of the warehouse is taken down, the view subtracts the slice's
    * partials algebraically (∝ |deleted| — the base is never
    * rescanned), and the rollup query — rewritten onto the SHRUNK view
    * by the same Catalyst rule — must hash-match the from-scratch
    * aggregate over the survivors. Exact decimal/long subtraction
    * makes delete-refresh ≡ survivors-rebuild; cells whose row count
    * reaches 0 drop out entirely (`MatViewSpec` pins the cell-drop and
    * that min/max views REFUSE the delete by name). */
  val mvRefreshDelete = GQuery(
    "mv_refresh_delete",
    (s, d) => {
      val base = savedMvDeletePath(s, d)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE l_orderkey % 3 <> 0
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** EPOCH-MV state: base built on the even half, the view created as
    * manifest generation 0, base grown to full, the view refreshed as
    * generation 1 through [[graft.plans.EpochMv.refresh]] — every flip
    * one atomic manifest rename + one atomic catalog swap, no
    * maintenance window. */
  private val mvEpochSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvEpochBasePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvEpochSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mvre_base_$tag"
      val layout = s"${graft.GraftSession.scratchDir}/mvre_layout_$tag"
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_returnflag",
          "l_linestatus")
      li.where(col("l_orderkey") % 2 === 0)
        .write.mode("overwrite").parquet(base)
      val d0 = graft.plans.EpochMv.EpochMvDef(base, layout,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity",
            Some(DecimalType(38, 2)), "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"),
          graft.plans.MatView.AggSpec("min", "l_quantity", None,
            "min_qty_p"),
          graft.plans.MatView.AggSpec("max", "l_quantity", None,
            "max_qty_p")))
      graft.plans.EpochMv.create(s, d0)
      val delta = li.where(col("l_orderkey") % 2 === 1)
        .localCheckpoint(true)
      delta.write.mode("append").parquet(base)
      graft.plans.EpochMv.refresh(s, d0, delta, batchId = 1L)
      base
    }

  /** Serve-safe view maintenance, driver-verified end to end: the
    * warehouse grows by a delta batch, the EPOCH-layout view merges
    * the delta's partials into a NEW manifest generation (the same
    * merge frames as `mv_refresh` — the arithmetic is shared), the
    * Catalyst rewrite atomically re-points at the fresh generation,
    * and the rollup through it must hash-match the from-scratch
    * aggregate over the grown table. Identical oracle to `mv_refresh`:
    * the layout change (swap → manifest flip) must be invisible in
    * the served answer — what changed is that a concurrent reader
    * never needed a maintenance window (`EpochMvSpec` pins the atomic
    * catalog swap and pinned-generation reads). */
  val mvRefreshEpoch = GQuery(
    "mv_refresh_epoch",
    (s, d) => {
      val base = savedMvEpochBasePath(s, d)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .select(col("l_returnflag"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"), col("min_qty"), col("max_qty"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    mvRewrite.oracle)

  /** Base copy + view WITH min/max partials, then a takedown slice
    * removed through [[graft.plans.MatView.refreshDelete]]'s targeted
    * RECOUNT path (extrema are not subtractable — only the delete
    * batch's cells recompute from surviving base rows). Ordering
    * follows the takedown contract: the view recounts BEFORE the base
    * shrinks. */
  private val mvMinmaxDelSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvMinmaxDeletePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvMinmaxDelSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mvdx_base_$tag"
      val mv = s"${graft.GraftSession.scratchDir}/mvdx_view_$tag"
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_returnflag",
          "l_linestatus")
      li.write.mode("overwrite").parquet(base)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_p"),
          count(lit(1)).as("cnt_p"),
          min(col("l_quantity")).as("min_qty_p"),
          max(col("l_quantity")).as("max_qty_p"))
        .write.mode("overwrite").parquet(mv)
      graft.plans.MatView.register(graft.plans.MatView.MvDef(base, mv,
        Seq("l_returnflag", "l_linestatus"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity",
            Some(DecimalType(38, 2)), "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"),
          graft.plans.MatView.AggSpec("min", "l_quantity", None,
            "min_qty_p"),
          graft.plans.MatView.AggSpec("max", "l_quantity", None,
            "max_qty_p"))))
      val doomed = graft.Pq.read(s, base)
        .where(col("l_orderkey") % 3 === 0)
        .localCheckpoint(true)
      // takedown-first: the recount scans the doomed rows' cells while
      // they still exist, then the data-plane delete shrinks the base
      graft.plans.MatView.refreshDelete(s, base, doomed)
      graft.ops.Layout.replaceDir(s,
        graft.Pq.read(s, base).where(col("l_orderkey") % 3 =!= 0), base)
      base
    }

  /** Min/max views under DELETE — the targeted-recount gate,
    * driver-verified end to end: extrema partials cannot subtract a
    * deleted value (the runner-up was never stored), so the delete
    * refresh recomputes ONLY the affected cells from their surviving
    * base rows (∝ affected groups' rows — never the full base, never
    * the other cells, which pass through byte-identical). The rollup
    * — rewritten onto the recounted view by the Catalyst rule,
    * MIN/MAX re-extremized over cell partials — must hash-match the
    * from-scratch aggregate over the survivors: recount ≡ rebuild,
    * through the rewrite path, extrema included. */
  val mvRefreshDeleteMinmax = GQuery(
    "mv_refresh_delete_minmax",
    (s, d) => {
      val base = savedMvMinmaxDeletePath(s, d)
      graft.Pq.read(s, base)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .select(col("l_returnflag"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"), col("min_qty"), col("max_qty"))
        .transform(Out.boundedSort(_, col("l_returnflag")))
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(l_quantity) AS min_qty,
             MAX(l_quantity) AS max_qty
      FROM lineitem
      WHERE l_orderkey % 3 <> 0
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  /** Dedicated fact copy + view at JOIN-KEY granularity for the
    * star-schema rewrite: the view pre-aggregates lineitem by
    * l_suppkey (|suppliers| rows), so a dim-grouped rollup joins
    * |view| × supplier instead of scanning the fact table. */
  private val mvJoinSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def savedMvJoinBasePath(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvJoinSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${graft.GraftSession.scratchDir}/mvj_base_$tag"
      val mv = s"${graft.GraftSession.scratchDir}/mvj_view_$tag"
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_quantity")
        .write.mode("overwrite").parquet(base)
      graft.Pq.read(s, base)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_p"),
          count(lit(1)).as("cnt_p"))
        .write.mode("overwrite").parquet(mv)
      graft.plans.MatView.register(graft.plans.MatView.MvDef(base, mv,
        Seq("l_suppkey"),
        Seq(graft.plans.MatView.AggSpec("sum", "l_quantity",
            Some(DecimalType(38, 2)), "sum_qty_p"),
          graft.plans.MatView.AggSpec("count", "", None, "cnt_p"))))
      base
    }

  /** The STAR-SCHEMA rewrite, driver-verified: a rollup grouped by a
    * DIM attribute over `fact ⋈ dim` re-plans onto `view ⋈ dim` — the
    * fact table pre-aggregated at join-key granularity, so the query
    * reads |suppliers| view rows instead of the fact table (the
    * canonical warehouse dashboard join; at 100 TB the fact scan is
    * the entire cost). Exact under join multiplicity: each view
    * partial scales by the same per-key match count a row-level join
    * would apply. The oracle recomputes from the raw join, so the
    * hash match certifies the aggregate-through-join algebra end to
    * end; `MatViewSpec` pins the plan (view scanned, fact base not)
    * and the dim-aggregate/outer-join/row-filter blocks. */
  val mvRewriteJoin = GQuery(
    "mv_rewrite_join",
    (s, d) => {
      val base = savedMvJoinBasePath(s, d)
      val fact = graft.Pq.read(s, base)
      val dim = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(38, 2)))
          .as("sum_qty_dec"),
          count(lit(1)).as("n_rows"))
        .select(col("s_nationkey"),
          col("sum_qty_dec").cast(DoubleType).as("sum_qty"),
          col("n_rows"))
        .transform(Out.boundedSort(_, col("s_nationkey")))
    },
    Some("""
      SELECT s.s_nationkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey
      ORDER BY s.s_nationkey
    """))

  /** ROLLUP through the materialized view — the Expand-shape rewrite:
    * `rollup(flag, status)` compiles to Aggregate over Expand, and the
    * rule re-plans the Expand onto the view's partials (each grouping
    * set replicates partials exactly as it would base rows, so
    * re-aggregation per set IS the rollup over the view). Sub-total
    * AND grand-total rows — the dashboard's drill-down frame — serve
    * at |view| cost; AVG rides along via the sum/count decomposition.
    * NULL rolled-up keys coalesce to a sentinel in BOTH engines (the
    * `agg_rollup` ordering discipline). Shares [[savedMvAvgBasePath]]'s
    * registered view (uncast sum + COUNT(col) + COUNT(*) partials). */
  val mvRewriteRollup = GQuery(
    "mv_rewrite_rollup",
    (s, d) => {
      val base = savedMvAvgBasePath(s, d)
      graft.Pq.read(s, base)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          avg(col("l_quantity")).as("avg_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("status"),
          col("sum_qty"), col("n_rows"), col("avg_qty"))
        .transform(Out.boundedSort(_, col("flag"), col("status")))
    },
    Some("""
      SELECT COALESCE(l_returnflag, '<all>') AS flag,
             COALESCE(l_linestatus, '<all>') AS status,
             SUM(l_quantity) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             AVG(l_quantity) AS avg_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY flag, status
    """))

  /** CDC-DRIVEN view maintenance: the MV subscribes to the table
    * tier's change log instead of being handed deltas — the
    * composition the two r18 faces exist for. The view reads its base
    * exactly ONCE (at create); every subsequent mutation arrives as
    * change rows from [[EpochTable.changesWithBefore]]: before-images
    * (op ∈ upsert/delete, flag-gated) apply as NEGATED partials,
    * after-images (op ∈ insert/upsert) as positive partials — an
    * upsert that moves a row BETWEEN groups decrements the old cell
    * and increments the new one, the group-migration case naive
    * delta-only maintenance gets wrong. The planted STALE group
    * empties entirely and the count-0 cell drop reaps it (asserted at
    * build). */
  private val mvCdcSaved =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def mvCdcDef(tag: String): graft.plans.EpochMv.EpochMvDef =
    graft.plans.EpochMv.EpochMvDef(
      s"${graft.GraftSession.scratchDir}/mvcdc_base_$tag",
      s"${graft.GraftSession.scratchDir}/mvcdc_view_$tag",
      Seq("egroup"),
      Seq(graft.plans.MatView.AggSpec("sum", "value_dec",
          Some(DecimalType(38, 2)), "sum_v_p"),
        graft.plans.MatView.AggSpec("count", "", None, "cnt_p")))

  private[ops] def savedMvCdcTag(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.BuildOnce.memo(mvCdcSaved, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val tbl = s"${graft.GraftSession.scratchDir}/mvcdc_tbl_$tag"
      val typed = CoreQueries.loadTyped.fn(s, d)
      def shaped(df: org.apache.spark.sql.DataFrame) =
        df.select(coalesce(col("etype"), lit("(null)")).as("egroup"),
          col("value_dec"))
      EpochTable.refresh(s, tbl,
        typed.where(col("event_id") % 2 === 0)
          .withColumn("etype",
            when(col("event_id") % 14 === 0, lit("STALE"))
              .otherwise(col("etype"))),
        version = 0L)
      val d0 = mvCdcDef(tag)
      // the ONE base read the view ever performs
      shaped(EpochTable.serve(s, tbl))
        .write.mode("overwrite").parquet(d0.basePath)
      graft.plans.EpochMv.create(s, d0)
      // the table moves on: a merge (replacements that MIGRATE groups
      // + fresh keys), a delta, a takedown
      EpochTable.merge(s, tbl,
        typed.where(col("event_id") % 14 === 0 ||
          (col("event_id") % 2 === 1 && col("event_id") % 5 === 0)),
        version = 1L, keys = Seq("event_id"))
      EpochTable.refreshDelta(s, tbl,
        typed.where(col("event_id") % 2 === 1 &&
          col("event_id") % 5 =!= 0), version = 2L)
      EpochTable.delete(s,
        typed.where(col("event_id") % 10 === 6).select("event_id"),
        tbl, batchId = 1L)
      // maintain PURELY from the change log
      val head = graft.ops.Epoch.resolve(s, tbl).get.epoch
      val chg = EpochTable.changesWithBefore(s, tbl, 0L, head,
        keys = Seq("event_id")).localCheckpoint(true)
      val befores = chg.where(col("_before_present"))
        .select(coalesce(col("before_etype"), lit("(null)"))
          .as("egroup"),
          col("before_value_dec").as("value_dec"))
      val afters = chg.where(col("_op") =!= "delete")
        .select(coalesce(col("etype"), lit("(null)")).as("egroup"),
          col("value_dec"))
      graft.plans.EpochMv.refreshDelete(s, d0, befores, batchId = 1L)
      graft.plans.EpochMv.refresh(s, d0, afters, batchId = 1L)
      // the STALE group emptied — the count-0 drop must reap its cell
      val served = graft.Pq.read(s, 
        graft.plans.EpochMv.currentDef(s, d0).mvPath)
      require(served.where(col("egroup") === "STALE").isEmpty,
        "mv_refresh_cdc: the emptied STALE cell survived maintenance")
      tag
    }

  /** Incremental view maintenance DRIVEN BY THE CHANGE FEED,
    * driver-verified: the view never re-reads its base after create —
    * upserts/deletes/inserts arrive as change rows with before-images
    * (resolved from retained versions, no write-side capture) and
    * apply as negated + positive partials; the served rollup must
    * hash-equal the from-scratch aggregate over the FINAL table state,
    * group migrations and the emptied group included. ≙ keeping the
    * reference's summary tables right across amendment cycles without
    * its monthly full reload. */
  val mvRefreshCdc = GQuery(
    "mv_refresh_cdc",
    (s, d) => {
      val tag = savedMvCdcTag(s, d)
      graft.Pq.read(s, 
        graft.plans.EpochMv.currentDef(s, mvCdcDef(tag)).mvPath)
        .select(col("egroup"),
          col("sum_v_p").cast(DoubleType).as("sum_v"),
          col("cnt_p").as("n_rows"))
        .transform(Out.boundedSort(_, col("egroup")))
    },
    Some("""
      WITH t AS (
        SELECT event_id,
               CAST(CAST(value AS DECIMAL(14,2)) AS DOUBLE) AS value_dec,
               NULLIF(TRIM(event_type), '') AS etype
        FROM events),
      v0 AS (
        SELECT event_id, value_dec,
               CASE WHEN event_id % 14 = 0 THEN 'STALE' ELSE etype END
                 AS etype
        FROM t WHERE event_id % 2 = 0),
      mrg AS (
        SELECT event_id, value_dec, etype FROM t
        WHERE event_id % 14 = 0
           OR (event_id % 2 = 1 AND event_id % 5 = 0)),
      v1 AS (
        SELECT * FROM v0
        WHERE event_id NOT IN (SELECT event_id FROM mrg)
        UNION ALL SELECT * FROM mrg),
      v2 AS (
        SELECT * FROM v1
        UNION ALL
        SELECT event_id, value_dec, etype FROM t
        WHERE event_id % 2 = 1 AND event_id % 5 <> 0),
      fin AS (SELECT * FROM v2 WHERE event_id % 10 <> 6)
      SELECT COALESCE(etype, '(null)') AS egroup,
             CAST(SUM(CAST(value_dec AS DECIMAL(38,2))) AS DOUBLE)
               AS sum_v,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM fin
      GROUP BY 1
      ORDER BY 1
    """))

  val all: Seq[GQuery] =
    Seq(incrAgg, incrDistinct, incrTopk, rollingWau, overlapSketch,
      zorderLayout, warehouseRefresh, incrPipeline, mvRewrite,
      mvRewriteFiltered, mvRefresh, mvRewriteAvg, mvRefreshDelete,
      mvRefreshDeleteMinmax, mvRefreshEpoch, mvRefreshCdc,
      mvRewriteJoin, mvRewriteRollup)
}
