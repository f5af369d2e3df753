package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** The batch relational operator surface (SURVEY.md §2.2): scan,
  * projection, filter, all join shapes, aggregation (hash/distinct/
  * rollup/cube/collect), windows (ranking/analytic/frames), sort/limit/
  * top-k, set ops, dedup. Every query is pure built-in Catalyst — the
  * optimizer does pushdown/pruning/join-selection; nothing here is
  * hand-scheduled.
  *
  * Scale notes (100 TB):
  *  - `nation`/`region` (and filtered dimension sides) are broadcast
  *    explicitly; fact-fact joins stay shuffle joins keyed on the join
  *    column so AQE can re-plan skew.
  *  - Aggregates run partial→final (map-side combine) automatically;
  *    DECIMAL sums keep results order-independent so the same query
  *    hash-matches on any cluster size.
  */
object Relational extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Order-independent sum of a fixed-point-valued double column: cast to
    * DECIMAL (exact grid recovery), sum exactly, emit double. */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val q01_scan_project = QueryDef(
    "q01_scan_project",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
            l_extendedprice * (1.0 - l_discount) AS rev
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  val q02_filter_pred = QueryDef(
    "q02_filter_pred",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
        lit("1997-06-30").cast("timestamp"))
        && col("l_quantity") < 25
        && col("l_returnflag").isin("A", "R")
        && !col("l_linestatus").like("O%"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_linestatus"),
        (col("l_returnflag") <=> col("l_linestatus")).as("nsafe_eq"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus,
            l_returnflag IS NOT DISTINCT FROM l_linestatus AS nsafe_eq
            FROM lineitem
            WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-06-30'
              AND l_quantity < 25 AND l_returnflag IN ('A','R')
              AND l_linestatus NOT LIKE 'O%'
            ORDER BY l_orderkey, l_linenumber"""))

  val q03_join_star = QueryDef(
    "q03_join_star",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_li"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("rev"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, count(*) AS n_li,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  val q04_join_left = QueryDef(
    "q04_join_left",
    (s, dir) => {
      val hi = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      t(s, dir, "orders")
        .join(hi, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(count(col("l_orderkey")).as("n_hi"),
          coalesce(sum("l_quantity"), lit(0.0)).as("qty_hi"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, count(l_orderkey) AS n_hi,
            coalesce(sum(l_quantity), 0.0) AS qty_hi
            FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45) li
              ON o_orderkey = l_orderkey
            GROUP BY o_orderkey ORDER BY o_orderkey"""))

  val q05_join_full = QueryDef(
    "q05_join_full",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
        .select("c_custkey", "c_name")
      val o = t(s, dir, "orders").filter(col("o_custkey") % 5 === 0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
          coalesce(col("c_name"), lit("<none>")).as("cname"),
          coalesce(col("n_orders"), lit(-1L)).as("n_orders"))
        .orderBy("k")
    },
    Some("""SELECT coalesce(c_custkey, o_custkey) AS k,
            coalesce(c_name, '<none>') AS cname,
            CAST(coalesce(n_orders, -1) AS BIGINT) AS n_orders
            FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
            FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
                       WHERE o_custkey % 5 = 0 GROUP BY o_custkey) o
              ON c_custkey = o_custkey
            ORDER BY k"""))

  val q06_join_semi = QueryDef(
    "q06_join_semi",
    (s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 200000)
            ORDER BY c_custkey"""))

  val q07_join_anti = QueryDef(
    "q07_join_anti",
    (s, dir) => {
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
            ORDER BY c_custkey"""))

  val q08_join_theta = QueryDef(
    "q08_join_theta",
    (s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("k1"),
        col("n_name").as("name1"), col("n_regionkey").as("rk1"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("k2"),
        col("n_name").as("name2"), col("n_regionkey").as("rk2"))
      n1.join(n2, col("rk1") === col("rk2") && col("k1") < col("k2"))
        .select("name1", "name2", "rk1")
        .orderBy("name1", "name2")
    },
    Some("""SELECT n1.n_name AS name1, n2.n_name AS name2, n1.n_regionkey AS rk1
            FROM nation n1 JOIN nation n2
              ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
            ORDER BY name1, name2"""))

  /** As-of join (latest order at or before each event's time, per user)
    * — DuckDB's ASOF JOIN semantics, expressed as range-join +
    * row_number()=1 with a total tie-break so both engines agree.
    * The reference domain analog: latest resource state ≤ a given ts. */
  val q09_join_asof = QueryDef(
    "q09_join_asof",
    (s, dir) => {
      val e = t(s, dir, "events").select("event_id", "user_id", "ts")
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val joined = e.join(o,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
      // arg-max by (o_orderdate, o_orderkey) via max_by on a struct:
      // lexicographic struct comparison = the window's DESC/DESC order,
      // but as a partial+final aggregation — each partition ships one
      // candidate per event instead of sorting all matches (the window
      // form re-sorts the whole join output at 100 TB).
      joined.groupBy("event_id")
        .agg(
          first(col("user_id")).as("user_id"),
          max_by(
            struct(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
            struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
        .select(col("event_id"), col("user_id"), col("best.o_orderkey").as("o_orderkey"),
          col("best.o_orderdate").cast("date").as("o_date"),
          col("best.o_totalprice").as("o_totalprice"))
        .orderBy("event_id")
    },
    Some("""WITH ranked AS (
              SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
                     row_number() OVER (PARTITION BY e.event_id
                                        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e JOIN orders o
                ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
            SELECT event_id, user_id, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
                   o_totalprice
            FROM ranked WHERE rn = 1 ORDER BY event_id"""))

  /** As-of join WITH TOLERANCE (bounded staleness) + left semantics:
    * each error event gets the same user's latest purchase no older
    * than 60 minutes, or NULLs if none — the feature-store lookup shape
    * ("most recent value, but never staler than Δ"), which plain as-of
    * (q09) can't express. Same partial-aggregable max_by argmax as q09;
    * the tolerance bound also SHRINKS the join: at 100 TB the range
    * predicate prunes almost all candidate pairs before the argmax. */
  val q66_join_asof_tolerance = QueryDef(
    "q66_join_asof_tolerance",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts").as("err_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val best = err.join(pur,
        col("user_id") === col("p_user")
          && col("p_ts") <= col("err_ts")
          && col("p_ts") >= col("err_ts") - expr("INTERVAL 60 MINUTES"))
        .groupBy("event_id")
        .agg(max_by(struct(col("p_id"), col("p_ts")), struct(col("p_ts"), col("p_id"))).as("best"))
        .select(col("event_id"), col("best.p_id").as("p_id"), col("best.p_ts").as("p_ts"))
      err.join(best, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("err_ts")).as("err_epoch"),
          col("p_id"),
          (unix_timestamp(col("err_ts")) - unix_timestamp(col("p_ts"))).as("age_s"))
        .orderBy("event_id")
    },
    Some("""WITH err AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
            pur AS (
              SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
              WHERE event_type = 'purchase'),
            ranked AS (
              SELECT e.event_id, p.p_id, p.p_ts,
                     row_number() OVER (PARTITION BY e.event_id
                                        ORDER BY p.p_ts DESC, p.p_id DESC) AS rn
              FROM err e JOIN pur p
                ON e.user_id = p.user_id
                AND p.p_ts <= e.ts
                AND p.p_ts >= e.ts - INTERVAL 60 MINUTE)
            SELECT e.event_id, e.user_id,
                   CAST(floor(epoch(e.ts)) AS BIGINT) AS err_epoch,
                   r.p_id,
                   CAST(floor(epoch(e.ts)) AS BIGINT)
                     - CAST(floor(epoch(r.p_ts)) AS BIGINT) AS age_s
            FROM err e LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
              USING (event_id)
            ORDER BY event_id"""))

  val q10_agg_tpch_q1 = QueryDef(
    "q10_agg_tpch_q1",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
            sum(l_quantity) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
            sum(l_quantity) / count(*) AS avg_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
            CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
            count(*) AS n
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  val q11_agg_distinct = QueryDef(
    "q11_agg_distinct",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_ps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            count(DISTINCT l_partkey) AS nd_part,
            count(DISTINCT l_suppkey) AS nd_supp,
            count(DISTINCT (l_partkey, l_suppkey)) AS nd_ps,
            count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** HLL sketch. The two engines' sketches differ by construction, so
    * the raw estimate can't hash-match — but the sketch's CONTRACT can:
    * each engine asserts its own estimate against its own exact count
    * (|approx − exact| / exact < 15%, 3σ of the 5% default rsd), and the
    * boolean + the exact anchor are cross-engine comparable. This gives
    * the approx row a real pass/fail instead of rows-only. */
  val q12_agg_approx = QueryDef(
    "q12_agg_approx",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .select(col("l_returnflag"), col("nd_exact"),
        (abs(col("approx") - col("nd_exact")) / col("nd_exact") < 0.15).as("within_tol"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_exact,
            abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
              / count(DISTINCT l_partkey) < 0.15 AS within_tol
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Approximate-quantile sketch row, verified the q12 way: sketches are
    * engine-specific (Spark KLL-style percentile_approx vs DuckDB
    * t-digest), so each engine asserts ITS OWN estimate lands within 5%
    * of the column's range of ITS OWN exact median; the boolean and the
    * exact anchor hash-match across engines. */
  val q76_agg_approx_quantile = QueryDef(
    "q76_agg_approx_quantile",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("median(l_quantity)").as("med_exact"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx"),
        (max(col("l_quantity")) - min(col("l_quantity"))).as("rng"))
      .select(col("l_returnflag"), col("med_exact"),
        (abs(col("approx") - col("med_exact")) <= col("rng") * 0.05).as("within_tol"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            median(l_quantity) AS med_exact,
            abs(approx_quantile(l_quantity, 0.5) - median(l_quantity))
              <= (max(l_quantity) - min(l_quantity)) * 0.05 AS within_tol
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val q13_agg_rollup = QueryDef(
    "q13_agg_rollup",
    (s, dir) => {
      // Via the spark.sql surface: referencing rollup grouping columns
      // after .agg() trips Spark 4.1's ambiguous-self-join detector in
      // the DataFrame API (the Expand under rollup duplicates its input
      // attributes); SQL-path resolution handles it correctly, and
      // exercising spark.sql over registered views is part of the
      // declared API surface anyway.
      Tables.registerAll(s, dir)
      s.sql("""SELECT CAST(grouping_id() AS BIGINT) AS gid,
                      coalesce(n_name, '<all>') AS nname,
                      coalesce(o_orderpriority, '<all>') AS prio,
                      count(*) AS n,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
               FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY ROLLUP(n_name, o_orderpriority)
               ORDER BY gid, nname, prio""")
    },
    Some("""SELECT CAST(GROUPING(n_name, o_orderpriority) AS BIGINT) AS gid,
            coalesce(n_name, '<all>') AS nname,
            coalesce(o_orderpriority, '<all>') AS prio,
            count(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP(n_name, o_orderpriority)
            ORDER BY gid, nname, prio"""))

  val q14_agg_cube = QueryDef(
    "q14_agg_cube",
    (s, dir) => t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
        grouping_id().cast("long").as("gid"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
        coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
        col("n"), col("qty"))
      .orderBy("gid", "rf", "ls"),
    Some("""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            coalesce(l_returnflag, '<all>') AS rf,
            coalesce(l_linestatus, '<all>') AS ls,
            count(*) AS n, sum(l_quantity) AS qty
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY gid, rf, ls"""))

  val q15_agg_collect = QueryDef(
    "q15_agg_collect",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          max_by(col("c_name"), col("c_custkey")).as("latest_cust"),
          min_by(col("c_name"), col("c_custkey")).as("first_cust"),
          count(lit(1)).as("n"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
            array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
            max_by(c_name, c_custkey) AS latest_cust,
            min_by(c_name, c_custkey) AS first_cust,
            count(*) AS n
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  val q16_window_rank = QueryDef(
    "q16_window_rank",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val wTies = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"))
      val wTotal = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        rank().over(wTies).cast("long").as("rnk"),
        dense_rank().over(wTies).cast("long").as("drnk"),
        row_number().over(wTotal).cast("long").as("rn"),
        ntile(4).over(wTotal).cast("long").as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
            CAST(rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS rnk,
            CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS BIGINT) AS drnk,
            CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
            CAST(ntile(4)     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS quartile
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Distribution window functions (the §2.2 ranking family's
    * remainder): percent_rank and cume_dist are exact integer-ratio
    * doubles — (rank-1)/(n-1) and rank_with_ties/n — so they are
    * bit-identical across engines with the same ties ordering. */
  val q77_window_distribution = QueryDef(
    "q77_window_distribution",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
            percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pr,
            cume_dist()    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
            FROM orders ORDER BY o_orderkey"""))

  val q17_window_analytic = QueryDef(
    "q17_window_analytic",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"),
          first(col("event_type")).over(wf).as("first_type"),
          last(col("event_type")).over(wAll).as("last_type"),
          nth_value(col("event_type"), 2).over(wAll).as("second_type"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type,
            lag(value)  OVER w AS prev_v,
            lead(value) OVER w AS next_v,
            first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
            last_value(event_type) OVER wall AS last_type,
            nth_value(event_type, 2) OVER wall AS second_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                   wall AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY event_id"""))

  val q18_window_frames = QueryDef(
    "q18_window_frames",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, Window.currentRow)
      val dec = col("o_totalprice").cast(DecimalType(18, 2))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec).over(run).cast("double").as("running_total"),
          (sum(dec).over(mov).cast("double") / count(lit(1)).over(mov)).as("moving_avg"),
          count(lit(1)).over(run).as("n_so_far"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER run AS DOUBLE) AS running_total,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER mov AS DOUBLE)
              / count(*) OVER mov AS moving_avg,
            count(*) OVER run AS n_so_far
            FROM orders
            WINDOW run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY o_custkey, o_orderkey"""))

  /** RANGE frame over an integral time axis: per-user 1-hour trailing
    * event-value sum — the batch analog of a sliding stream window. */
  val q19_window_range = QueryDef(
    "q19_window_range",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("sec", unix_timestamp(col("ts")))
      val w = Window.partitionBy("user_id").orderBy(col("sec"))
        .rangeBetween(-3600L, 0L)
      e.select(col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double").as("hour_sum"),
        count(lit(1)).over(w).as("hour_n"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
            CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS hour_sum,
            count(*) OVER w AS hour_n
            FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  val q20_sort_topk = QueryDef(
    "q20_sort_topk",
    (s, dir) => t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_date"))
      .limit(15),
    Some("""SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_date
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""))

  /** Top-k per group — the distributed form (window + filter) rather
    * than a global sort: at scale this is one shuffle on the group key. */
  val q21_topk_per_group = QueryDef(
    "q21_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** q21's top-k-per-group through the engine's custom PARTIAL-PRUNE
    * operator (`graft.plans.TopKPerKey` — LogicalPlan + SparkStrategy +
    * SparkPlan via the extension points): a bounded per-partition
    * top-3-per-customer heap runs BEFORE the window's exchange, capping
    * shuffle volume at k·|keys| rows per partition; the exact window
    * after the shuffle restores precise rank semantics. Identical
    * output to q21 (same oracle) — the prune order is total
    * (totalprice desc, orderkey), so the partial pass provably keeps a
    * superset of the true top-k. TopKPruneSpec asserts plan shape,
    * row-reduction metrics and result equality with the unpruned
    * plan. */
  val q113_topk_pruned = QueryDef(
    "q113_topk_pruned",
    (s, dir) => {
      val pruned = graft.plans.TopKPerKey.prune(
        t(s, dir, "orders"),
        keys = Seq("o_custkey"),
        order = Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 3)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      pruned
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  /** TPC-H Q5 shape (local supplier volume): the 6-way star-plus-snowflake
    * join — lineitem⋈orders⋈customer⋈supplier⋈nation⋈region with the
    * customer-nation = supplier-nation colocation predicate, region
    * filter and a one-year date slice. This is the join-ORDERING
    * benchmark: Catalyst pushes the region/date filters below the
    * joins, broadcasts the pruned dimension chain
    * (region→nation→…) and leaves only the fact-side equi-joins as
    * exchanges. Revenue sums through DECIMAL (order-independent). */
  val q114_tpch_q5 = QueryDef(
    "q114_tpch_q5",
    (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"
          && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(38, 6))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q3 shape (shipping priority): 3-way join, pre-join filters
    * on both fact sides, grouped revenue, top-10 by revenue — the
    * "filter early, aggregate late" pattern with a bounded final
    * sort. */
  val q115_tpch_q3 = QueryDef(
    "q115_tpch_q3",
    (s, dir) => {
      val cutoff = lit("1998-01-01").cast("timestamp")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= cutoff)
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(38, 6))).cast("double").as("revenue"))
        .select(col("l_orderkey"),
          unix_timestamp(col("o_orderdate")).as("odate_sec"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
                   CAST(floor(epoch(o_orderdate)) AS BIGINT) AS odate_sec,
                   o_orderpriority,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate >= TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Weighted average (price-weighted mean discount per supplier
    * nation): both the weighted sum and the weight total accumulate as
    * DECIMAL, so the final ratio divides two bit-identical doubles —
    * the weighted-mean aggregate no engine ships natively, built
    * partial-aggregable from two exact sums. */
  val q119_weighted_avg = QueryDef(
    "q119_weighted_avg",
    (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(38, 8)))
            .cast("double").as("wsum"),
          sum(col("l_extendedprice").cast(DecimalType(38, 8))).cast("double").as("wtot"))
        .select(col("n_name"), round(col("wsum") / col("wtot"), 10).as("wavg_discount"),
          col("wtot"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
                   round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,8))) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE), 10) AS wavg_discount,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS wtot
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  val q22_setops = QueryDef(
    "q22_setops",
    (s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val onlyC = cn.except(sn).withColumn("side", lit("cust_only"))
      val onlyS = sn.except(cn).withColumn("side", lit("supp_only"))
      val both = cn.intersect(sn).withColumn("side", lit("both"))
      onlyC.unionByName(onlyS).unionByName(both)
        .select(col("side"), col("nk"))
        .orderBy("side", "nk")
    },
    Some("""WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
                 sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
            SELECT 'cust_only' AS side, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
            UNION ALL
            SELECT 'supp_only' AS side, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
            UNION ALL
            SELECT 'both' AS side, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
            ORDER BY side, nk"""))

  /** Multiset set operations (the ALL variants q22's distinct forms
    * don't cover): INTERSECT ALL keeps min(multiplicities), EXCEPT ALL
    * subtracts them — summarized as per-key counts so the multiset
    * semantics are visible and the output is exact-typed. */
  val q82_setops_all = QueryDef(
    "q82_setops_all",
    (s, dir) => {
      val a = t(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 3).select(col("l_suppkey").as("k"))
      val b = t(s, dir, "lineitem")
        .filter(col("l_linenumber") >= 3).select(col("l_suppkey").as("k"))
      val ia = a.intersectAll(b).groupBy("k")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = a.exceptAll(b).groupBy("k")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.unionByName(ea).select("op", "k", "n").orderBy("op", "k")
    },
    Some("""WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber <= 3),
                 b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber >= 3)
            SELECT 'intersect_all' AS op, k, count(*) AS n
            FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
            UNION ALL
            SELECT 'except_all' AS op, k, count(*) AS n
            FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
            ORDER BY op, k"""))

  /** Exact dedup with a deterministic survivor (keep lowest linenumber)
    * — `dropDuplicates` picks an arbitrary row, which can't hash-match
    * an oracle, so the engine's canonical dedup is window-based. */
  val q23_dedup_exact = QueryDef(
    "q23_dedup_exact",
    (s, dir) => {
      // Keep-first = argmin per key, expressed as min(struct(...)): the
      // struct's lexicographic order IS the tie-break order (complete —
      // the synthetic lineitem has duplicate (l_orderkey, l_linenumber)
      // pairs, so an incomplete key would pick nondeterministically).
      // A hash aggregate with map-side partial combine: one shuffle of
      // one pre-reduced row per key, no per-partition sort — the shape
      // that wins over the row_number window at any scale.
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(min(struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))).as("m"))
        .select(col("l_orderkey"),
          col("m.l_linenumber").as("l_linenumber"),
          col("m.l_partkey").as("l_partkey"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey
            FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem)
            WHERE rn = 1 ORDER BY l_orderkey"""))

  val q24_distinct = QueryDef(
    "q24_distinct",
    (s, dir) => t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** Explicit GROUPING SETS (the general form rollup/cube specialize). */
  val q55_agg_grouping_sets = QueryDef(
    "q55_agg_grouping_sets",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT CAST(grouping_id() AS BIGINT) AS gid,
                      coalesce(l_returnflag, '<any>') AS rf,
                      coalesce(l_linestatus, '<any>') AS ls,
                      count(*) AS n, sum(l_quantity) AS qty
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY gid, rf, ls""")
    },
    Some("""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
            coalesce(l_returnflag, '<any>') AS rf,
            coalesce(l_linestatus, '<any>') AS ls,
            count(*) AS n, sum(l_quantity) AS qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY gid, rf, ls"""))

  /** Exact percentiles/median (linear interpolation in both engines);
    * the approximate-sketch form is q12 (rows-only by design). */
  val q56_agg_percentile = QueryDef(
    "q56_agg_percentile",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("median(l_quantity)").as("med_qty"),
        expr("percentile(l_quantity, 0.25)").as("p25_qty"),
        expr("percentile(l_quantity, 0.95)").as("p95_qty"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            median(l_quantity) AS med_qty,
            quantile_cont(l_quantity, 0.25) AS p25_qty,
            quantile_cont(l_quantity, 0.95) AS p95_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Statistical aggregates. Engines use different accumulation
    * algorithms (Welford vs naive), so results agree only to ~1e-12
    * relative — rounded to 6 decimals, which both engines land on
    * identically for these magnitudes. */
  val q57_agg_stats = QueryDef(
    "q57_agg_stats",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            round(stddev_samp(l_quantity), 6) AS sd_qty,
            round(var_samp(l_quantity), 6) AS var_qty,
            round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
            round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Linear-regression aggregates (slope / intercept / R²) built from
    * EXACT fixed-point sums instead of the built-in `regr_*` functions:
    * the built-ins accumulate doubles, so their result depends on
    * partitioning order — a 1000-executor plan would not reproduce a
    * single-threaded oracle. Here every moment (Σx, Σy, Σx², Σy², Σxy)
    * is summed as DECIMAL(38,6) — each addend is exact on the data's
    * value grid, decimal addition is associative, so the moments are
    * partition-invariant — and the closed-form regression arithmetic
    * runs on those exact moments with an identical expression tree in
    * both engines (same IEEE ops in the same order → bit-identical).
    * Partial aggregation (map-side combine) still applies: decimal SUM
    * and COUNT are both algebraic. */
  val q64_agg_regression = QueryDef(
    "q64_agg_regression",
    (s, dir) => {
      def m(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast("double")
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").as("x"), col("l_extendedprice").as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          m(col("x")).as("sx"), m(col("y")).as("sy"),
          m(col("x") * col("x")).as("sxx"),
          m(col("y") * col("y")).as("syy"),
          m(col("x") * col("y")).as("sxy"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("slope",
          (col("nd") * col("sxy") - col("sx") * col("sy"))
            / (col("nd") * col("sxx") - col("sx") * col("sx")))
        .withColumn("intercept", (col("sy") - col("slope") * col("sx")) / col("nd"))
        // r2 is rounded (q57 convention): Σy² exceeds 2^53, so the two
        // engines' decimal→double casts can differ by 1 ulp (~1e-20 here).
        .withColumn("r2",
          round(((col("nd") * col("sxy") - col("sx") * col("sy"))
            * (col("nd") * col("sxy") - col("sx") * col("sy")))
            / ((col("nd") * col("sxx") - col("sx") * col("sx"))
              * (col("nd") * col("syy") - col("sy") * col("sy"))), 10))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
          col("sxy"), col("slope"), col("intercept"), col("r2"))
        .orderBy("l_returnflag")
    },
    Some("""WITH moments AS (
              SELECT l_returnflag,
                     count(*) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
                     CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY l_returnflag),
            derived AS (
              SELECT *,
                     CAST(n AS DOUBLE) AS nd,
                     (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
              FROM moments)
            SELECT l_returnflag, n, sx, sy, sxy, slope,
                   (sy - slope * sx) / nd AS intercept,
                   round(((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
                     / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 10) AS r2
            FROM derived ORDER BY l_returnflag"""))

  override val defs: Seq[QueryDef] = Seq(
    q01_scan_project, q02_filter_pred, q03_join_star, q04_join_left,
    q05_join_full, q06_join_semi, q07_join_anti, q08_join_theta,
    q09_join_asof, q10_agg_tpch_q1, q11_agg_distinct, q12_agg_approx,
    q13_agg_rollup, q14_agg_cube, q15_agg_collect, q16_window_rank,
    q17_window_analytic, q18_window_frames, q19_window_range,
    q20_sort_topk, q21_topk_per_group, q22_setops, q23_dedup_exact,
    q24_distinct, q55_agg_grouping_sets, q56_agg_percentile, q57_agg_stats,
    q64_agg_regression, q66_join_asof_tolerance, q76_agg_approx_quantile,
    q77_window_distribution, q82_setops_all, q113_topk_pruned, q114_tpch_q5, q115_tpch_q3, q119_weighted_avg)
}
