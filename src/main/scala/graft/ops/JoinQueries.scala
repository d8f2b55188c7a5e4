package graft.ops

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.3 joins. All reference joins are soft-FK equi-joins
  * (`models/tracking.py:~120`, `models/common.py:~200`); Spark's
  * sort-merge/broadcast-hash machinery plus AQE covers every one.
  *
  * Scale notes: dimension sides (nation/region/supplier, ≙ the reference's
  * lookup-code tables `models/inactive.py:~400`) are explicitly
  * `broadcast()` — at 100 TB the fact side never shuffles for those. The
  * fact⋈fact joins (lineitem⋈orders) shuffle on the join key once and AQE
  * handles skew.
  */
object JoinQueries {

  /** J1 FK inner equi-join: filings↔filers ≙ orders↔customer. */
  val joinInner = GQuery(
    "join_inner",
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
          col("o_orderstatus"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, c_custkey, c_name, o_orderstatus
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """))

  /** J2 broadcast dimension decode: fact column ↔ tiny code table
    * (`LookupCodesCd`). The `broadcast` hint pins the hash side so no
    * shuffle of the fact table ever happens. */
  val joinBroadcast = GQuery(
    "join_broadcast",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast(DoubleType).as("sum_price"))
        .transform(Out.boundedSort(_, col("n_name"))),
    Some("""
      SELECT n_name, COUNT(*) AS cnt,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name
    """))

  /** J3 left outer: filings with/without summary rows (`SmryCd` optional)
    * ≙ customers with/without orders; COUNT(o_orderkey) counts matches
    * only, so order-less customers report 0. */
  val joinLeft = GQuery(
    "join_left",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(DecimalType(18, 2))),
            lit(0).cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast(DoubleType).as("sum_spend"))
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
             CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(38,2)) AS DOUBLE) AS sum_spend
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey
    """))

  /** J4 semi join: "files that have at least one error row"
    * (`verifycalaccessrawdata.py:~40-90`) ≙ customers with a big order.
    * left_semi never duplicates or widens the left side. */
  val joinSemi = GQuery(
    "join_semi",
    (s, d) => {
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 150000.0)
      Tables.customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      ORDER BY c_custkey
    """))

  /** J5 anti join: expected-minus-loaded verification
    * (`verifycalaccessrawdata.py:~40-90`) ≙ customers without orders. */
  val joinAnti = GQuery(
    "join_anti",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey
    """))

  /** J6 multi-way star join: filing → filer → itemizations canonical query
    * ≙ lineitem⋈orders⋈customer⋈nation⋈region revenue rollup. Dimensions
    * broadcast; the single fact⋈fact join shuffles once; AQE may reorder. */
  val joinStar = GQuery(
    "join_star",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("cnt"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
            .cast(DoubleType)
            .as("revenue"))
        .transform(Out.boundedSort(_, col("r_name"))),
    Some("""
      SELECT r_name, COUNT(*) AS cnt,
             CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name
    """))

  /** TPC-H Q5 shape — the 6-table "local supplier volume" report:
    * revenue per nation for orders in a date window where the customer
    * and the line's supplier share a nation inside one region. Beyond
    * [[joinStar]] this adds the cross-fact CORRELATION (c_nationkey =
    * s_nationkey — an extra equi-condition between two dimension
    * branches of the same fact row), selective dim + date filters that
    * must reach the scans, and the revenue-ordered output. Join
    * strategy: facts shuffle on their keys; all four dims broadcast;
    * the region filter prunes nation before it ever reaches the fact
    * side. Revenue follows the joinStar decimal discipline (per-row
    * product cast DECIMAL(18,4), exact order-free sum, double at the
    * edge). */
  val q5LocalSupplier = GQuery(
    "q5_local_supplier",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .where(year(col("o_orderdate")).between(1996, 1997)),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
            .cast(DoubleType)
            .as("revenue"))
        .transform(Out.boundedSort(_, col("revenue").desc, col("n_name"))),
    Some("""
      SELECT n_name,
             CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
       AND year(o_orderdate) BETWEEN 1996 AND 1997
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
       AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """))

  /** As-of join (extension — the reference has only equi-joins, but a
    * temporal training pipeline needs this constantly): for every purchase
    * event, the most recent click by the same user at or before it.
    *
    * Not implemented as a range join (quadratic candidates) — the
    * union-then-running-max form shuffles once on user_id and computes the
    * as-of match with a RANGE-frame window, so equal-timestamp matches are
    * included deterministically regardless of row order. At 100 TB this is
    * the canonical shape: one exchange, no per-row probing. */
  val joinAsof = GQuery(
    "join_asof",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_click_ts",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("last_click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_click_ts")))
            .cast(LongType).as("gap_us"))
        .orderBy("user_id", "purchase_ts")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, ts, event_type FROM events WHERE user_id < 50),
      m AS (
        SELECT user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'click' THEN ts END) OVER
                 (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_ts
        FROM ev)
      SELECT user_id, ts AS purchase_ts, last_click_ts,
             CAST(epoch_us(ts) - epoch_us(last_click_ts) AS BIGINT) AS gap_us
      FROM m
      WHERE event_type = 'purchase'
      ORDER BY user_id, purchase_ts
    """))

  /** Non-equi range (band) join: price → price-band dimension. There is
    * no equi key, so Spark plans BroadcastNestedLoopJoin — which is the
    * CORRECT 100 TB shape for a small band table (each partition streams
    * once past the handful of broadcast bands; no shuffle of the fact).
    * For a LARGE range side the rewrite is binning: assign each fact row
    * to bucket floor(price/step) and equi-join on the bucket — turning
    * the range join back into a shuffle-hash join. The band dimension is
    * inlined literally on both engines. */
  val joinRange = GQuery(
    "join_range",
    (s, d) => {
      import s.implicits._
      val bands = Seq(("budget", 0.0, 1100.0), ("mid", 1100.0, 1500.0),
        ("premium", 1500.0, 1800.0), ("luxury", 1800.0, 2200.0))
        .toDF("band", "lo", "hi")
      Tables.part(s, d)
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") &&
            col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("p_retailprice").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast(DoubleType).as("sum_price"))
        .transform(Out.boundedSort(_, col("band")))
    },
    Some("""
      SELECT band, COUNT(*) AS cnt,
             CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price
      FROM part
      JOIN (VALUES ('budget', 0.0, 1100.0), ('mid', 1100.0, 1500.0),
                   ('premium', 1500.0, 1800.0), ('luxury', 1800.0, 2200.0))
           AS bands(band, lo, hi)
        ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band
      ORDER BY band
    """))

  /** Full outer join: reconcile two per-key summaries keeping keys
    * present on either side — the "compare download counts vs load
    * counts" lineage audit shape. NULL-key coalescing keeps the output
    * deterministic and the join stays a plain shuffle hash/merge join on
    * the key. */
  val joinFull = GQuery(
    "join_full",
    (s, d) => {
      val bought = Tables.orders(s, d).filter(col("o_orderkey") <= 5000)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val balance = Tables.customer(s, d).filter(col("c_custkey") <= 400)
        .select(col("c_custkey").as("custkey"),
          col("c_acctbal").cast(DecimalType(18, 2))
            .cast(DoubleType).as("acctbal"))
      bought.join(balance, Seq("custkey"), "full_outer")
        .select(col("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("acctbal"), lit(0.0)).as("acctbal"))
        .orderBy("custkey")
    },
    Some("""
      WITH bought AS (
        SELECT o_custkey AS custkey, COUNT(*) AS n_orders
        FROM orders WHERE o_orderkey <= 5000 GROUP BY 1),
      balance AS (
        SELECT c_custkey AS custkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        FROM customer WHERE c_custkey <= 400)
      SELECT COALESCE(b.custkey, bal.custkey) AS custkey,
             COALESCE(b.n_orders, 0) AS n_orders,
             COALESCE(bal.acctbal, 0.0) AS acctbal
      FROM bought b FULL OUTER JOIN balance bal ON b.custkey = bal.custkey
      ORDER BY custkey
    """))

  /** S5 driver-visible: bucketed-layout join. Both sides are written as
    * bucketed+sorted external tables on the join key (8 buckets,
    * `PartitionedSink.writeBucketed` — files under the per-process
    * scratch dir, catalog entries session-local), then sort-merge-joined
    * via the `merge` hint (a hint,
    * not a session-conf mutation, so tiny test data can't silently take
    * the broadcast path instead). With co-bucketed layout the SMJ plans
    * with ZERO exchanges — `BucketedJoinSpec` pins that plan shape; this
    * entry pins that the exchange-free result is value-identical to the
    * oracle's plain join. At 100 TB bucketing the fact tables once on
    * the FK is what removes the per-query fact-side shuffle entirely —
    * and "once" is the operational model, so the tables are written at
    * most once per (process, sfDir) and every invocation after the first
    * times what a user actually repeats: the exchange-free join itself.
    * The write path stays covered by `BucketedJoinSpec` + the first rep. */
  private val bucketedWritten =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Write the two bucketed tables at most once per (process, sfDir);
    * returns the (lineitem, orders) catalog table names. Names embed the
    * sanitized sfDir plus its hash — the sanitization alone is lossy
    * ("/sf0.1" and "/sf0_1" collide), and a collision would silently
    * cross-wire two dirs' tables — so two data dirs in one JVM (specs +
    * bench) can't read each other's layout. Assumes the dir's parquet is
    * immutable for the process lifetime (true of the testdata dirs). */
  private def ensureBucketed(s: org.apache.spark.sql.SparkSession,
      d: String): (String, String) = {
    // The memo caches CATALOG names, but saveAsTable entries live in the
    // SparkContext-scoped in-memory catalog: a stopped-and-recreated
    // session in the same JVM (specs do this) would get cached names for
    // tables that no longer exist. Validate against the live catalog and
    // rebuild on a miss rather than fail with TABLE_OR_VIEW_NOT_FOUND.
    bucketedWritten.get(d).foreach { case (tl, to) =>
      if (!s.catalog.tableExists(tl) || !s.catalog.tableExists(to))
        bucketedWritten.remove(d)
    }
    graft.BuildOnce.memo(bucketedWritten, d) {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_") +
        "_" + (d.hashCode.toLong & 0xffffffffL).toHexString
      val base = s"${graft.GraftSession.scratchDir}/bq_$tag"
      val (tl, to) = (s"graft_bq_lineitem_$tag", s"graft_bq_orders_$tag")
      s.sql(s"DROP TABLE IF EXISTS $tl")
      s.sql(s"DROP TABLE IF EXISTS $to")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem")
        .format("parquet").saveAsTable(tl)
      Tables.orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders")
        .format("parquet").saveAsTable(to)
      (tl, to)
    }
  }

  val bucketedJoin = GQuery(
    "bucketed_join",
    (s, d) => {
      val (tl, to) = ensureBucketed(s, d)
      s.table(tl).hint("merge")
        .join(s.table(to),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"))
        .select(col("o_year").cast(IntegerType).as("o_year"),
          col("n_lines"),
          col("sum_qty").cast(DecimalType(18, 2)).cast(DoubleType)
            .as("sum_qty"))
        .transform(Out.boundedSort(_, col("o_year")))
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
      ORDER BY 1
    """))

  /** Skew-handling join, driver-visible (the join twin of `agg_salted`):
    * lineitem ⋈ supplier through `Skew.saltedJoin` — the big side gets a
    * random salt, the small side is exploded ×8 so every (key, salt)
    * partner exists — then aggregated per nation. Salting never changes
    * inner-join semantics (each big-side row still meets its partners
    * exactly once), which the plain-join oracle proves value-exactly.
    * This is the remedy when a hot key floods one task and the small
    * side is too big to broadcast but fine to duplicate ×salts. */
  val joinSalted = GQuery(
    "join_salted",
    (s, d) =>
      Skew.saltedJoin(
        Tables.lineitem(s, d).select("l_suppkey", "l_quantity"),
        Tables.supplier(s, d)
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        "l_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).cast(DoubleType).as("sum_qty"))
        .transform(Out.boundedSort(_, col("s_nationkey"))),
    Some("""
      SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1
      ORDER BY 1
    """))

  /** Entity-resolution fuzzy join — THE downstream task on
    * campaign-finance rosters (contributor/committee name dedup, cf. the
    * reference's filer tables): candidate pairs by a cheap BLOCKING key
    * (here: the name's last 6 chars), verified by Levenshtein ≤ 2. The
    * roster is the customer list plus a deterministically typo'd variant
    * for every 10th key (same derivation in the oracle), so the matcher
    * demonstrably finds exactly those pairs.
    *
    * Scale shape: the self-join is an equi-join on the blocking key —
    * candidate volume is sum of block sizes squared, bounded by block
    * granularity (the LSH-banding idea applied to names), and the edit
    * distance only runs inside blocks. NEVER an all-pairs name compare. */
  val fuzzyMatch = GQuery(
    "fuzzy_match",
    (s, d) => {
      val base = Tables.customer(s, d)
        .select((col("c_custkey") * 2).as("id"), col("c_name").as("name"))
      val typod = Tables.customer(s, d)
        .filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") * 2 + 1).as("id"),
          regexp_replace(col("c_name"), "Customer#", "Custmer#").as("name"))
      val roster = base.union(typod)
        .withColumn("block", expr("right(name, 6)"))
      val a = roster.select(col("block"), col("id").as("id_a"),
        col("name").as("name_a"))
      val b = roster.select(col("block"), col("id").as("id_b"),
        col("name").as("name_b"))
      // threshold form = banded DP (O(k·n) per pair, not O(n²)) and
      // returns -1 above the band, so the <= 2 filter is unchanged
      a.join(b, "block")
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist",
          levenshtein(col("name_a"), col("name_b"), 2))
        .filter(col("dist") >= 0 && col("dist") <= 2)
        .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
          col("dist").cast(LongType).as("dist"))
        .orderBy("id_a", "id_b")
    },
    Some("""
      WITH roster AS (
        SELECT c_custkey * 2 AS id, c_name AS name FROM customer
        UNION ALL
        SELECT c_custkey * 2 + 1, replace(c_name, 'Customer#', 'Custmer#')
        FROM customer WHERE c_custkey % 10 = 0),
      blocked AS (SELECT id, name, right(name, 6) AS block FROM roster)
      SELECT a.id AS id_a, b.id AS id_b,
             a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 2
      ORDER BY id_a, id_b
    """))

  /** S5's other half, driver-visible: hive-style PARTITIONED sink →
    * partition-pruned scan. Documents are written partitioned by lang
    * (`PartitionedSink.writePartitioned`), read back, and filtered on
    * the partition column — the filter becomes a directory skip
    * (PartitionFilters, pinned in `AnnSkewSpec`'s sibling check here via
    * the oracle equivalence), so at 100 TB a one-language query reads
    * one directory, not the corpus. The oracle runs the same filter over
    * the unpartitioned original — equal output proves the layout round-
    * trips losslessly. */
  val partitionedScan = GQuery(
    "partitioned_scan",
    (s, d) => {
      val base = s"${graft.GraftSession.scratchDir}/part_" +
        d.replaceAll("[^A-Za-z0-9]", "_") + "/documents"
      graft.sinks.PartitionedSink.writePartitioned(
        Tables.documents(s, d), base, Seq("lang"))
      graft.sinks.PartitionedSink.readPartitioned(s, base)
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"))
        .transform(Out.boundedSort(_, col("source")))
    },
    Some("""
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      WHERE lang = 'en'
      GROUP BY 1
      ORDER BY 1
    """))

  def all: Seq[GQuery] =
    Seq(joinInner, joinBroadcast, joinLeft, joinSemi, joinAnti, joinStar,
      q5LocalSupplier, joinAsof, joinRange, joinFull, bucketedJoin,
      joinSalted, fuzzyMatch, partitionedScan)
}
