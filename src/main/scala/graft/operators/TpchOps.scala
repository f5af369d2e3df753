package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** The REMAINING TPC-H query shapes — with these 13, every one of the 22
  * TPC-H queries has an oracle-checked twin in the inventory (Q1=q10,
  * Q3=q115, Q5=q114, Q6=q140, Q7=q130, Q10=q139, Q13=q133, Q18=q127,
  * Q19=q141 predate this module). TPC-H is the public decision-support
  * benchmark; each query here is chosen for a PLAN SHAPE the rest of the
  * surface doesn't already pin:
  *
  *  - Q4  EXISTS → left-semi with a non-equi residual
  *  - Q8  double-role dimension (nation as customer- AND supplier-side)
  *  - Q9  multi-fact-dimension profit rollup by (nation, year)
  *  - Q11 HAVING against a global scalar aggregate of the same view
  *  - Q12 dual conditional counts (CASE-sum) per derived category
  *  - Q14 conditional revenue share (single-row CASE ratio)
  *  - Q15 view + scalar-max equality (argmax via self-aggregate)
  *  - Q16 NOT IN exclusion + count(DISTINCT) per attribute triple
  *  - Q17 correlated per-group average (decorrelated to agg + join)
  *  - Q20 nested IN chain (parts → qualifying pairs → suppliers)
  *  - Q21 double-correlated EXISTS/NOT EXISTS (decorrelated to one agg)
  *  - Q22 anti-join against recent activity + global scalar threshold
  *  - Q2  per-group argmin against a derived min (min-cost supplier)
  *
  * Fixture adaptations (the driver's TPC-H-ish tables omit some spec
  * columns; every divergence is structural-shape-preserving and noted on
  * the query): no `partsupp` table (Q2/Q11/Q16/Q20 derive the
  * supplier↔part relation from `lineitem`), no
  * `l_commitdate`/`l_receiptdate` (lateness = `l_shipdate` vs
  * `o_orderdate` + interval), no `l_shipmode` (Q12 buckets by lateness),
  * no `c_phone` (Q22's country code = last two digits of `c_name`), no
  * `ps_supplycost` (Q9's cost leg uses `p_retailprice`).
  *
  * Determinism: per `QueryDef` — every double aggregate routes through
  * DECIMAL before the cast to double; ratios divide two such exact
  * doubles in the same textual order in both engines; every output has a
  * total ORDER BY on exact-typed keys. Scalar thresholds (Q11/Q15/Q17/
  * Q22) are computed as `CAST(exact-decimal-sum AS DOUBLE) / count`, so
  * both engines derive bit-identical IEEE doubles before any comparison.
  *
  * Scale: all group-by keys are natural join/dimension keys (shuffle on
  * the fact key at most once); global scalars are 1-row aggregates
  * cross-joined back (broadcast by construction); the Q21/Q17
  * decorrelations turn per-row correlated subqueries into single
  * pre-aggregations — the form that survives 100× where a correlated
  * rewrite would re-scan the fact table per outer row.
  */
object TpchOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  private def ts(d: String): Column = lit(d).cast("timestamp")

  /** l_extendedprice * (1 - l_discount), the TPC-H revenue term. */
  private def vol: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** TPC-H Q4 (order priority checking): orders in one quarter having at
    * least one line shipped after the order date (EXISTS → left-semi
    * join whose condition carries the non-equi `l_shipdate >
    * o_orderdate` residual beside the key equality; fixture has no
    * l_commitdate/l_receiptdate). The semi-join keeps the orders side
    * deduplicated by construction — no DISTINCT pass — and the quarter
    * filter is pushed to the orders scan. */
  val q165_tpch_q4 = QueryDef(
    "q165_tpch_q4",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q8 (national market share): nation plays TWO roles — the
    * customer's nation chain fixes the market (region AMERICA), the
    * supplier's nation is the share numerator — so the dimension joins
    * twice under different column names (pre-renamed projections; the
    * idiomatic Spark answer to SQL's table aliases). Share = two
    * DECIMAL-routed sums divided once, per year. */
  val q166_tpch_q8 = QueryDef(
    "q166_tpch_q8",
    (s, dir) => {
      val custNation = t(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_rk"))
      val suppNation = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(custNation, col("c_nationkey") === col("cn_key"))
        .join(t(s, dir, "region"), col("cn_rk") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("sn_key"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("r_name") === "AMERICA" && col("p_type") === "ECONOMY"
          && col("o_orderdate") >= ts("1995-01-01") && col("o_orderdate") < ts("1997-01-01"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_5", vol).otherwise(lit(0.0)), 6).as("nation_vol"),
          dsum(vol, 6).as("total_vol"))
        .withColumn("mkt_share", col("nation_vol") / col("total_vol"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_5'
                                      THEN l_extendedprice * (1.0 - l_discount)
                                      ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS nation_vol,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_vol,
                   CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_5'
                                      THEN l_extendedprice * (1.0 - l_discount)
                                      ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            JOIN part ON l_partkey = p_partkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY o_year"""))

  /** TPC-H Q9 (product-type profit): profit per (supplier nation, order
    * year) over parts whose name matches a substring — the widest
    * fact-to-all-dimensions rollup in the benchmark. Fixture has no
    * ps_supplycost; the cost leg uses p_retailprice * l_quantity, which
    * preserves the shape (a per-unit cost drawn from a second dimension
    * table multiplied into the fact row). */
  val q167_tpch_q9 = QueryDef(
    "q167_tpch_q9",
    (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").like("%gear%")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(vol - col("p_retailprice") * col("l_quantity"), 6).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                 - p_retailprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  /** TPC-H Q11 (important stock): per-part value restricted to one
    * region's suppliers, kept only when above a GLOBAL threshold derived
    * from the same aggregate — the HAVING-against-scalar-subquery shape.
    * The spec's fixed fraction scales inversely with SF; here the
    * threshold is 2× the mean part value, which is scale-free (the
    * driver verifies at several SFs). The scalar is a 1-row aggregate
    * cross-joined back — a broadcast by construction, never a second
    * scan of the fact table. Fixture has no partsupp: value =
    * Σ(l_extendedprice·l_quantity) from lineitem. */
  val q168_tpch_q11 = QueryDef(
    "q168_tpch_q11",
    (s, dir) => {
      val v = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .groupBy("l_partkey")
        .agg(dsum(col("l_extendedprice") * col("l_quantity"), 4).as("value"))
      val thr = v.agg(
        (dsum(col("value"), 4) / count(lit(1))).as("mean_value"))
      v.crossJoin(thr)
        .filter(col("value") > lit(2.0) * col("mean_value"))
        .select(col("l_partkey"), col("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH v AS (
              SELECT l_partkey,
                     CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS value
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'
              GROUP BY l_partkey)
            SELECT l_partkey, value FROM v
            WHERE value > 2.0 * (SELECT CAST(sum(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / count(*) FROM v)
            ORDER BY value DESC, l_partkey"""))

  /** TPC-H Q12 (shipping modes / priority): the dual CASE-sum — per
    * category, one pass counts two disjoint priority classes. Fixture
    * has no l_shipmode/l_commitdate/l_receiptdate; the category is
    * shipping lateness (shipped > 60 days after order), which keeps
    * Q12's essence: a derived bucket crossed with a priority split,
    * folded into map-side partial aggregation. */
  val q169_tpch_q12 = QueryDef(
    "q169_tpch_q12",
    (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .withColumn("ship_bucket",
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "LATE")
            .otherwise("ONTIME"))
        .groupBy("ship_bucket")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .cast("long").as("low_line_count"))
        .orderBy("ship_bucket")
    },
    Some("""SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1 ORDER BY ship_bucket"""))

  /** TPC-H Q14 (promotion effect): conditional revenue share over one
    * ship month — numerator and denominator accumulate in the SAME
    * aggregation pass (two DECIMAL sums), the percentage divides the two
    * exact doubles once. Single-row output. */
  val q170_tpch_q14 = QueryDef(
    "q170_tpch_q14",
    (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= ts("1997-09-01") && col("l_shipdate") < ts("1997-10-01"))
        .agg(
          dsum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0)), 6).as("promo_rev"),
          dsum(vol, 6).as("total_rev"))
        .withColumn("promo_share", lit(100.0) * col("promo_rev") / col("total_rev"))
    },
    Some("""SELECT CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1.0 - l_discount)
                                      ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) AS promo_rev,
                   CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_rev,
                   100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1.0 - l_discount)
                                      ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS promo_share
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              AND l_shipdate < TIMESTAMP '1997-10-01'"""))

  /** TPC-H Q15 (top supplier): a revenue view over one quarter, then the
    * supplier(s) whose revenue EQUALS the view's max — the argmax-via-
    * scalar-subquery shape. Revenue doubles come off the same DECIMAL
    * route in both engines, so the equality is exact, not
    * fixture-lucky; the max is a 1-row aggregate cross-joined back. */
  val q171_tpch_q15 = QueryDef(
    "q171_tpch_q15",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-04-01"))
        .groupBy("l_suppkey")
        .agg(dsum(vol, 6).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(mx)
        .filter(col("total_revenue") === col("max_revenue"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (
              SELECT l_suppkey,
                     CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-04-01'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
            ORDER BY s_suppkey"""))

  /** TPC-H Q16 (parts/supplier relationship): count DISTINCT suppliers
    * per (brand, type, size) triple over a size IN-list, excluding a
    * blacklist via NOT IN (→ left-anti join; the stand-in for the
    * spec's complaints predicate is suppliers with negative balance —
    * fixture has no s_comment). The supplier↔part relation derives from
    * lineitem (no partsupp); countDistinct shuffles once on the triple
    * with the suppkey as the distinct key. */
  val q172_tpch_q16 = QueryDef(
    "q172_tpch_q16",
    (s, dir) => {
      val excluded = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part")
            .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO"
              && col("p_size").isin(1, 9, 19, 29, 39, 49)),
          col("l_partkey") === col("p_partkey"))
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).cast("long").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
              AND p_size IN (1, 9, 19, 29, 39, 49)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q17 (small-quantity-order revenue): lines of one brand whose
    * quantity is below 20% of that part's average quantity — the
    * correlated-scalar-average decorrelated to a per-part aggregate +
    * equi-join (the rewrite Catalyst itself applies to the correlated
    * form; stated explicitly so the oracle mirrors it textually). The
    * per-part average divides an exact DECIMAL sum by the count, so the
    * 0.2·avg threshold is bit-identical in both engines. */
  val q173_tpch_q17 = QueryDef(
    "q173_tpch_q17",
    (s, dir) => {
      val partAvg = t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg((dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"))
        .withColumnRenamed("l_partkey", "pa_partkey")
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_brand") === "Brand#11"),
          col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("pa_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice"), 4) / lit(7.0)).as("avg_yearly"))
    },
    Some("""WITH pa AS (
              SELECT l_partkey AS pa_partkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / count(*) AS avg_qty
              FROM lineitem GROUP BY 1)
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / 7.0 AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN pa ON l_partkey = pa_partkey
            WHERE p_brand = 'Brand#11' AND l_quantity < 0.2 * avg_qty"""))

  /** TPC-H Q20 (potential part promotion): the nested IN chain — parts
    * by name prefix → (supplier, part) year volumes → suppliers whose
    * volume DOMINATES that part's total (no partsupp/availqty: the
    * excess-stock predicate becomes "shipped > 30% of the part's total
    * year volume", same chain, same direction) → suppliers of one
    * region. Every link is an aggregation or a semi-join; the supplier
    * output is dimension-bounded. */
  val q174_tpch_q20 = QueryDef(
    "q174_tpch_q20",
    (s, dir) => {
      val sq = t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").like("small%")).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(col("l_quantity"), 2).as("supp_qty"))
      val pt = sq.groupBy("l_partkey")
        .agg(dsum(col("supp_qty"), 2).as("part_qty"))
        .withColumnRenamed("l_partkey", "pt_partkey")
      val qualifying = sq.join(pt, col("l_partkey") === col("pt_partkey"))
        .filter(col("supp_qty") > lit(0.3) * col("part_qty"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some("""WITH sq AS (
              SELECT l_suppkey, l_partkey,
                     CAST(sum(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS supp_qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'small%'
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY 1, 2),
            pt AS (
              SELECT l_partkey AS pt_partkey,
                     CAST(sum(CAST(supp_qty AS DECIMAL(38,2))) AS DOUBLE) AS part_qty
              FROM sq GROUP BY 1)
            SELECT s_suppkey, s_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND s_suppkey IN (SELECT l_suppkey FROM sq JOIN pt ON l_partkey = pt_partkey
                                WHERE supp_qty > 0.3 * part_qty)
            ORDER BY s_suppkey"""))

  /** TPC-H Q21 (suppliers who kept orders waiting): the benchmark's
    * hardest correlation — for finalized orders, a supplier qualifies
    * when their line was late, ANOTHER supplier has a line on the order
    * (EXISTS), and NO OTHER supplier was late (NOT EXISTS). Both
    * correlated subqueries decorrelate into ONE per-order aggregate:
    * distinct-supplier count, distinct-LATE-supplier count, and the late
    * supplier when unique (min of a conditional — exact because nl = 1).
    * One shuffle on orderkey replaces two correlated re-scans per outer
    * row; at 100 TB that is the difference between a pass and a
    * quadratic. Lateness = shipped > 60 days after order date (fixture
    * has no l_receiptdate/l_commitdate). */
  val q175_tpch_q21 = QueryDef(
    "q175_tpch_q21",
    (s, dir) => {
      val f = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      // TWO-LEVEL aggregation instead of two distinct aggregates
      // (round 14, guide §2.3/§2.5): multiple countDistincts in one agg
      // plan as an Expand that triples the shuffled fact rows; grouping
      // to (order, supplier) first makes every level-2 aggregate plain
      // (n_supp = group count, n_late = count of any-late groups,
      // lone_late = min over any-late groups — identical values, max()
      // over booleans skips nulls exactly like the countDistinct(when)
      // it replaces).
      val perOS = f.groupBy("ok", "sk").agg(max(col("late")).as("any_late"))
      val perOrder = perOS.groupBy("ok")
        .agg(
          count(lit(1)).as("n_supp"),
          sum(when(col("any_late"), 1L).otherwise(0L)).as("n_late"),
          min(when(col("any_late"), col("sk"))).as("lone_late"))
      perOrder.filter(col("n_supp") > 1 && col("n_late") === 1)
        .groupBy("lone_late")
        .agg(count(lit(1)).cast("long").as("numwait"))
        .join(t(s, dir, "supplier"), col("lone_late") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""WITH f AS (
              SELECT l_orderkey AS ok, l_suppkey AS sk,
                     (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'),
            per_order AS (
              SELECT ok, count(DISTINCT sk) AS n_supp,
                     count(DISTINCT CASE WHEN late THEN sk END) AS n_late,
                     min(CASE WHEN late THEN sk END) AS lone_late
              FROM f GROUP BY ok),
            waits AS (
              SELECT lone_late, CAST(count(*) AS BIGINT) AS numwait
              FROM per_order WHERE n_supp > 1 AND n_late = 1
              GROUP BY lone_late)
            SELECT s_name, numwait
            FROM waits JOIN supplier ON lone_late = s_suppkey
            ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** TPC-H Q22 (global sales opportunity): above-average-balance
    * customers with NO recent orders, grouped by country code. Fixture
    * has no c_phone — the code is the last two digits of c_name — and
    * every customer has SOME order, so the anti-join excludes customers
    * with orders after 1999 (same shape: NOT EXISTS over a filtered
    * fact). The balance threshold is the usual exact-double global
    * scalar, cross-joined back. */
  val q176_tpch_q22 = QueryDef(
    "q176_tpch_q22",
    (s, dir) => {
      val avgBal = t(s, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .agg((dsum(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
      t(s, dir, "customer")
        .crossJoin(avgBal)
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders").filter(col("o_orderdate") >= ts("1999-01-01"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(expr("right(c_name, 2)").as("cntrycode"))
        .agg(count(lit(1)).cast("long").as("numcust"),
          dsum(col("c_acctbal"), 2).as("totacctbal"))
        .orderBy("cntrycode")
    },
    Some("""WITH ab AS (
              SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) / count(*) AS avg_bal
              FROM customer WHERE c_acctbal > 0)
            SELECT right(c_name, 2) AS cntrycode,
                   CAST(count(*) AS BIGINT) AS numcust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
            FROM customer, ab
            WHERE c_acctbal > avg_bal
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY 1 ORDER BY cntrycode"""))

  /** TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    * European supplier(s) with the LOWEST unit price — per-group argmin
    * against a derived min (the correlated `= (SELECT min…)` shape).
    * No partsupp: unit price = min(l_extendedprice / l_quantity) over
    * the supplier's lines (double division of identical doubles — exact
    * in both engines, so the argmin equality is a contract). The best-
    * price table is one row per part and joins back to the bounded
    * (supplier, part) aggregate, never to raw lineitem. */
  val q177_tpch_q2 = QueryDef(
    "q177_tpch_q2",
    (s, dir) => {
      val unitPrice = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"), col("n_name"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("min_price"))
      val best = unitPrice.groupBy(col("l_partkey").as("b_partkey"))
        .agg(min(col("min_price")).as("best_price"))
      unitPrice
        .join(best, col("l_partkey") === col("b_partkey")
          && col("min_price") === col("best_price"))
        .join(t(s, dir, "part").filter(col("p_size") <= 10 && col("p_type") === "LARGE"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"), col("min_price"))
        .orderBy("p_partkey", "s_suppkey")
    },
    Some("""WITH up AS (
              SELECT l_partkey, s_suppkey, s_name, n_name,
                     min(l_extendedprice / l_quantity) AS min_price
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'
              GROUP BY 1, 2, 3, 4),
            best AS (
              SELECT l_partkey AS b_partkey, min(min_price) AS best_price
              FROM up GROUP BY 1)
            SELECT p_partkey, s_suppkey, s_name, n_name, min_price
            FROM up
            JOIN best ON l_partkey = b_partkey AND min_price = best_price
            JOIN part ON l_partkey = p_partkey
            WHERE p_size <= 10 AND p_type = 'LARGE'
            ORDER BY p_partkey, s_suppkey"""))

  def defs: Seq[QueryDef] = Seq(
    q165_tpch_q4, q166_tpch_q8, q167_tpch_q9, q168_tpch_q11, q169_tpch_q12,
    q170_tpch_q14, q171_tpch_q15, q172_tpch_q16, q173_tpch_q17, q174_tpch_q20,
    q175_tpch_q21, q176_tpch_q22, q177_tpch_q2)
}
