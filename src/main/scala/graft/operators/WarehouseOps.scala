package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Reporting-layer operators: ordered string aggregation, boolean /
  * filtered aggregates, dense grid zero-fill, the TPC-H Q18 and Q7
  * join-aggregation shapes, gaps-and-islands activity streaks, and a
  * winsorized (clamped-percentile) robust mean.
  *
  * Scale notes per operator are on each def; the common theme is that
  * every grid / quartile / threshold side is BOUNDED (dimension-sized or
  * one row per group) and broadcasts, so the fact table is scanned once
  * and shuffled at most once on its natural key.
  */
object WarehouseOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Ordered string aggregation (LISTAGG/string_agg): supplier roster
    * per nation as one comma-joined, lexically sorted string. Spark has
    * no ordered string_agg built-in — `array_join(array_sort(
    * collect_list(…)))` is the idiomatic equivalent and keeps the
    * determinism the SQL `ORDER BY` inside the aggregate provides.
    * Group count is nation-bounded, collect size supplier-bounded. */
  val q123_string_agg = QueryDef(
    "q123_string_agg",
    (s, dir) => {
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).cast("long").as("n_suppliers"),
          array_join(array_sort(collect_list(col("s_name"))), ",").as("roster"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
                   string_agg(s_name, ',' ORDER BY s_name) AS roster
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** Boolean and filtered aggregates (count_if / bool_and / bool_or —
    * SQL FILTER clause semantics): per-priority order health check.
    * Single partial-aggregated pass; the conditionals fold into the
    * map-side combine like any other aggregate. */
  val q124_bool_aggs = QueryDef(
    "q124_bool_aggs",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"),
          expr("CAST(count_if(o_totalprice > 100000.0) AS BIGINT)").as("n_big"),
          expr("bool_and(o_totalprice > 0.0)").as("all_positive"),
          expr("bool_or(o_orderstatus = 'F')").as("has_final"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) FILTER (WHERE o_totalprice > 100000.0) AS BIGINT) AS n_big,
                   bool_and(o_totalprice > 0.0) AS all_positive,
                   bool_or(o_orderstatus = 'F') AS has_final
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Dense-grid zero-fill: every (region, order-status) cell reported
    * even when no orders exist — the cross join is dimension×dimension
    * (bounded: |region|·|status|), the fact-side counts aggregate before
    * the left join, so the grid never touches fact-table cardinality.
    * The canonical "report must show empty cells" reporting shape. */
  val q125_grid_zerofill = QueryDef(
    "q125_grid_zerofill",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val grid = t(s, dir, "region").select(col("r_name"))
        .crossJoin(orders.select(col("o_orderstatus")).distinct())
      val counts = orders
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "o_orderstatus")
        .agg(count(lit(1)).cast("long").as("n"))
      grid.join(counts, Seq("r_name", "o_orderstatus"), "left")
        .select(col("r_name"), col("o_orderstatus"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("r_name", "o_orderstatus")
    },
    Some("""WITH grid AS (
              SELECT r_name, o_orderstatus
              FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)),
            counts AS (
              SELECT r_name, o_orderstatus, CAST(count(*) AS BIGINT) AS n
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1, 2)
            SELECT g.r_name, g.o_orderstatus, COALESCE(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON g.r_name = c.r_name AND g.o_orderstatus = c.o_orderstatus
            ORDER BY g.r_name, g.o_orderstatus"""))

  /** TPC-H Q18 shape (large-volume customers): the HAVING-filtered
    * semi-aggregate — per-order quantity totals filtered to the extreme
    * tail, joined back to orders and customers. The aggregate runs
    * BEFORE the joins, so only the ~1% surviving orders reach the join
    * stage; quantity totals go through DECIMAL so the filter threshold
    * and output hash are accumulation-order-independent. */
  val q127_tpch_q18 = QueryDef(
    "q127_tpch_q18",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      big
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  /** Gaps-and-islands: per-user consecutive-day activity streaks from
    * the event log. The island key is the classic `day_number − row_
    * number` invariant — pure integer arithmetic after one per-user
    * window pass over DISTINCT user-days (which aggregate the raw log
    * down before any window runs). */
  val q128_islands = QueryDef(
    "q128_islands",
    (s, dir) => {
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      days
        .withColumn("rn", row_number().over(w))
        .withColumn("grp", datediff(col("d"), lit("2024-01-01").cast("date")) - col("rn"))
        .groupBy("user_id", "grp")
        .agg(min("d").as("start_day"), max("d").as("end_day"),
          count(lit(1)).cast("long").as("len_days"))
        .select(col("user_id"), col("start_day"), col("end_day"), col("len_days"))
        .orderBy("user_id", "start_day")
    },
    Some("""WITH days AS (
              SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
            numbered AS (
              SELECT user_id, d,
                     datediff('day', DATE '2024-01-01', d)
                       - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
              FROM days)
            SELECT user_id, min(d) AS start_day, max(d) AS end_day,
                   CAST(count(*) AS BIGINT) AS len_days
            FROM numbered GROUP BY user_id, grp
            ORDER BY user_id, start_day"""))

  /** Winsorized mean: clamp l_quantity to its per-priority [P5, P95]
    * fences before averaging — the robust-mean complement of q118's
    * outlier COUNT. Fences are NEAREST-RANK (value at rank ⌈p·n⌉), found
    * by an integer cumulative-count walk: quantities live on a tiny
    * integral domain, so aggregate to (priority, value, count) first
    * (map-side combine), then a ≤~50-row-per-priority window locates the
    * value whose cumulative rank range covers the fence rank. No
    * interpolated-percentile float ever crosses the engine boundary, so
    * fence equality is contract, not fixture-luck; all downstream
    * arithmetic is exact BIGINT. The fence table is one row per priority
    * and broadcasts into the clamping scan. */
  val q129_winsorized_mean = QueryDef(
    "q129_winsorized_mean",
    (s, dir) => {
      val joined = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          (col("l_quantity").cast("long") * lit(1000000L)).as("q_fp"))
      val freq = joined.groupBy("o_orderpriority", "q_fp")
        .agg(count(lit(1)).as("c"))
      val wOrd = Window.partitionBy("o_orderpriority").orderBy("q_fp")
      val wAll = Window.partitionBy("o_orderpriority")
      val cum = freq
        .withColumn("hi_rn", sum("c").over(wOrd))
        .withColumn("lo_rn", col("hi_rn") - col("c") + lit(1L))
        .withColumn("n_all", sum("c").over(wAll))
        .withColumn("lo_rank", expr("(5 * n_all + 99) div 100"))
        .withColumn("hi_rank", expr("(95 * n_all + 99) div 100"))
      val fences = cum.groupBy("o_orderpriority")
        .agg(
          max(when(col("lo_rank").between(col("lo_rn"), col("hi_rn")), col("q_fp")))
            .as("lo_fp"),
          max(when(col("hi_rank").between(col("lo_rn"), col("hi_rn")), col("q_fp")))
            .as("hi_fp"))
      joined.join(broadcast(fences), "o_orderpriority")
        .withColumn("c_fp", least(greatest(col("q_fp"), col("lo_fp")), col("hi_fp")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("c_fp").cast("long").as("sum_fp"),
          max("lo_fp").as("lo_fp"), max("hi_fp").as("hi_fp"))
        .withColumn("wmean_fp", expr("sum_fp div n"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH joined AS (
              SELECT o_orderpriority, CAST(l_quantity AS BIGINT) * 1000000 AS q_fp
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            freq AS (
              SELECT o_orderpriority, q_fp, count(*) AS c
              FROM joined GROUP BY 1, 2),
            cum AS (
              SELECT o_orderpriority, q_fp, c,
                     sum(c) OVER (PARTITION BY o_orderpriority ORDER BY q_fp) AS hi_rn,
                     sum(c) OVER (PARTITION BY o_orderpriority ORDER BY q_fp) - c + 1 AS lo_rn,
                     sum(c) OVER (PARTITION BY o_orderpriority) AS n_all
              FROM freq),
            fences AS (
              SELECT o_orderpriority,
                     max(CASE WHEN (5 * n_all + 99) // 100 BETWEEN lo_rn AND hi_rn
                              THEN q_fp END) AS lo_fp,
                     max(CASE WHEN (95 * n_all + 99) // 100 BETWEEN lo_rn AND hi_rn
                              THEN q_fp END) AS hi_fp
              FROM cum GROUP BY 1)
            SELECT j.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(least(greatest(q_fp, lo_fp), hi_fp)) AS BIGINT) AS sum_fp,
                   max(lo_fp) AS lo_fp, max(hi_fp) AS hi_fp,
                   CAST(sum(least(greatest(q_fp, lo_fp), hi_fp)) // count(*) AS BIGINT) AS wmean_fp
            FROM joined j JOIN fences USING (o_orderpriority)
            GROUP BY j.o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q7 shape (volume shipping between nation pairs): a five-way
    * join where BOTH ends of the fact row bind to a (different) copy of
    * the nation dimension, grouped by the pair and ship year. Both
    * nation sides broadcast; revenue goes through DECIMAL. The pair
    * filter (distinct nations among the first three) keeps the output
    * bounded while exercising the self-aliased-dimension shape. */
  val q130_tpch_q7 = QueryDef(
    "q130_tpch_q7",
    (s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter(col("sk") < 3 && col("ck") < 3 && col("sk") =!= col("ck"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(count(lit(1)).cast("long").as("n"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
              AND n1.n_nationkey <> n2.n_nationkey
            GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q13 shape (customer order-count distribution): a left join
    * with a COMPOUND condition (equi key + residual inequality) feeding
    * a count-of-counts double aggregation. The first groupBy shuffles on
    * c_custkey (the join key — Catalyst reuses the join partitioning);
    * the second aggregates a bounded key space (distinct order counts).
    * count(o_orderkey) counts only matched rows, preserving the
    * zero-order customers the left join keeps. */
  val q133_tpch_q13 = QueryDef(
    "q133_tpch_q13",
    (s, dir) => {
      val perCust = t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= lit("1-URGENT"),
          "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).cast("long").as("custdist"))
        .select(col("c_count").cast("long").as("c_count"), col("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""WITH per_cust AS (
              SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey)
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM per_cust GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q22 shape (rich-but-inactive accounts): customers above the
    * positive-balance mean with no urgent orders — a scalar-aggregate
    * threshold (one row, broadcasts into the scan) composed with a
    * LEFT ANTI join against the filtered order stream, rolled up per
    * nation. The threshold sum routes through DECIMAL so the cut line
    * is accumulation-order-independent; the anti join's build side is
    * the filtered (small) urgent-order key set. */
  val q134_rich_inactive = QueryDef(
    "q134_rich_inactive",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val thr = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
          / count(lit(1))).as("thr"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.crossJoin(thr)
        .filter(col("c_acctbal") > col("thr"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).cast("long").as("numcust"),
          dsum(col("c_acctbal"), 2).as("totbal"))
        .orderBy("n_name")
    },
    Some("""WITH thr AS (
              SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS thr
              FROM customer WHERE c_acctbal > 0.0)
            SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totbal
            FROM customer CROSS JOIN thr
            JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > thr
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY n_name ORDER BY n_name"""))

  /** nth_value / first_value / last_value over ordered per-customer
    * frames: the "second purchase" analytical shape. The default frame
    * (RANGE UNBOUNDED PRECEDING → CURRENT ROW) is shared by both
    * engines, so nth_value is NULL until the second row of the
    * partition — part of the pinned semantics; last_value explicitly
    * widens to the full frame (the default-frame last_value ≡ current
    * row is the classic SQL footgun, pinned here the correct way). */
  val q135_window_nth = QueryDef(
    "q135_window_nth",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .withColumn("last_price", last(col("o_totalprice")).over(wFull))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("first_price"), col("second_price"), col("last_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                   first_value(o_totalprice) OVER w AS first_price,
                   nth_value(o_totalprice, 2) OVER w AS second_price,
                   last_value(o_totalprice) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey"""))

  /** TPC-H Q11 shape (significant inventory share): per-part revenue
    * kept when it exceeds 1.5× the MEAN part share of global revenue —
    * a scale-relative cut, so the tail exists at every corpus size.
    * Both levels stay in exact DECIMAL — the global total is the
    * decimal sum of the per-part decimal sums (associative, so partial
    * aggregation is safe), and the one-row total broadcasts into the
    * filter scan. The threshold comparison happens on doubles derived
    * identically from the same exact decimals in both engines. */
  val q136_revenue_share = QueryDef(
    "q136_revenue_share",
    (s, dir) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))
      val pv = t(s, dir, "lineitem")
        .groupBy("l_partkey").agg(sum(rev).as("vdec"))
      val tot = pv.agg(sum(col("vdec")).as("tdec"), count(lit(1)).as("np"))
      pv.crossJoin(tot)
        .filter(col("vdec").cast("double") > col("tdec").cast("double") * lit(1.5) / col("np"))
        .select(col("l_partkey"), col("vdec").cast("double").as("val"))
        .orderBy("l_partkey")
    },
    Some("""WITH pv AS (
              SELECT l_partkey,
                     sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS vdec
              FROM lineitem GROUP BY l_partkey),
            tot AS (SELECT sum(vdec) AS tdec, count(*) AS np FROM pv)
            SELECT l_partkey, CAST(vdec AS DOUBLE) AS val
            FROM pv CROSS JOIN tot
            WHERE CAST(vdec AS DOUBLE) > CAST(tdec AS DOUBLE) * 1.5 / np
            ORDER BY l_partkey"""))

  /** First-touch / last-touch attribution: per user, the first and last
    * event (fully tie-broken by event_id) plus the activity count, in
    * ONE window pass — both row_numbers and the partition count come
    * from the same per-user shuffle, and only the two boundary rows per
    * user survive to the final (bounded) aggregation. */
  val q137_first_last_touch = QueryDef(
    "q137_first_last_touch",
    (s, dir) => {
      val wA = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wD = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
        .withColumn("rn_a", row_number().over(wA))
        .withColumn("rn_d", row_number().over(wD))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
        .filter(col("rn_a") === 1 || col("rn_d") === 1)
        .groupBy("user_id")
        .agg(max(when(col("rn_a") === 1, col("event_type"))).as("first_type"),
          max(when(col("rn_a") === 1, col("ts"))).as("first_ts"),
          max(when(col("rn_d") === 1, col("event_type"))).as("last_type"),
          max(when(col("rn_d") === 1, col("ts"))).as("last_ts"),
          max("n").cast("long").as("n_events"))
        .orderBy("user_id")
    },
    Some("""WITH r AS (
              SELECT user_id, ts, event_type,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rn_d,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events)
            SELECT user_id,
                   max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn_a = 1 THEN ts END) AS first_ts,
                   max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
                   max(CASE WHEN rn_d = 1 THEN ts END) AS last_ts,
                   CAST(max(n) AS BIGINT) AS n_events
            FROM r WHERE rn_a = 1 OR rn_d = 1
            GROUP BY user_id ORDER BY user_id"""))

  /** TPC-H Q10 shape (returned-item revenue, top 20 customers): fact
    * filter (returnflag) and a one-quarter date slice both push to the
    * scans, the nation dimension broadcasts, and the top-20 presentation
    * runs on the aggregated (customer-bounded) set — the canonical
    * "who cost us money this quarter" report. Revenue through DECIMAL;
    * the revenue-desc order is tie-broken by custkey so LIMIT is
    * deterministic. */
  val q139_tpch_q10 = QueryDef(
    "q139_tpch_q10",
    (s, dir) => {
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 4))
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q6 shape (forecast revenue change): the canonical
    * filter-pushdown microbenchmark — a single scan with a date-range,
    * discount-band and quantity predicate, no join, one global
    * aggregate. Every predicate must reach PushedFilters; the plan is
    * scan → partial agg → single-row final. */
  val q140_tpch_q6 = QueryDef(
    "q140_tpch_q6",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24.0)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(18, 4)))
          .cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n"))
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24.0"""))

  /** TPC-H Q19 shape (discounted-brand revenue): a join whose residual
    * predicate is a DISJUNCTION of per-brand conjunctions — the shape
    * that exercises OR-predicate handling: Catalyst factors the common
    * `l_partkey = p_partkey` out of the OR so the join stays equi, and
    * pushes the brand/size disjunction to the part scan. */
  val q141_tpch_q19 = QueryDef(
    "q141_tpch_q19",
    (s, dir) => {
      val cases =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)
          && col("l_quantity").between(1.0, 20.0)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 20)
          && col("l_quantity").between(5.0, 30.0)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 30)
          && col("l_quantity").between(10.0, 40.0))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(cases)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).cast("long").as("n"))
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                     AND l_quantity BETWEEN 1.0 AND 20.0)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                     AND l_quantity BETWEEN 5.0 AND 30.0)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                     AND l_quantity BETWEEN 10.0 AND 40.0)"""))

  def defs: Seq[QueryDef] = Seq(q123_string_agg, q124_bool_aggs, q125_grid_zerofill,
    q127_tpch_q18, q128_islands, q129_winsorized_mean, q130_tpch_q7,
    q133_tpch_q13, q134_rich_inactive, q135_window_nth, q136_revenue_share,
    q137_first_last_touch, q139_tpch_q10, q140_tpch_q6, q141_tpch_q19)
}
