package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Reshaping + subquery surface: pivot (wide), unpivot (long), scalar
  * and correlated subqueries (Catalyst decorrelation). Oracles express
  * the same SEMANTICS in portable SQL (conditional aggregation for
  * pivot, UNION for unpivot), per the determinism contract. */
object Reshape extends QueryModule {

  val q59_pivot = QueryDef(
    "q59_pivot",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id"),
    Some("""SELECT user_id,
            CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
            CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
            CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
            CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
            CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
            FROM events GROUP BY user_id ORDER BY user_id"""))

  val q60_unpivot = QueryDef(
    "q60_unpivot",
    (s, dir) => Tables.load(s, dir, "part")
      .unpivot(Array(col("p_partkey")),
        Array(col("p_brand"), col("p_type")), "attr", "value")
      .orderBy("p_partkey", "attr"),
    Some("""SELECT p_partkey, attr, value FROM (
              SELECT p_partkey, 'p_brand' AS attr, p_brand AS value FROM part
              UNION ALL
              SELECT p_partkey, 'p_type' AS attr, p_type AS value FROM part)
            ORDER BY p_partkey, attr"""))

  /** Scalar + correlated subqueries; Catalyst decorrelates the
    * correlated aggregate into a join. The global average routes
    * through DECIMAL (order-independence). */
  val q61_subqueries = QueryDef(
    "q61_subqueries",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice,
                      o_totalprice >
                        (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                  / count(*) FROM orders) AS above_avg,
                      (SELECT count(*) FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_quantity >= 45) AS n_hi
               FROM orders
               ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
            o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                        / count(*) FROM orders) AS above_avg,
            (SELECT count(*) FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 45) AS n_hi
            FROM orders
            ORDER BY o_orderkey"""))

  override val defs: Seq[QueryDef] = Seq(q59_pivot, q60_unpivot, q61_subqueries)
}
