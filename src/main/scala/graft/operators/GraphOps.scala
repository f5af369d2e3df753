package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph analytics expressed as join/aggregate rounds — the
  * same shape the transitive-closure labeling in
  * [[DedupOps.q68_dedup_clusters]] uses, applied to ranking. Each
  * PageRank round is: join ranks to edges on src (one shuffle on the
  * edge key), scale by weight/out-degree, re-aggregate by dst. At
  * 100 TB the edge list is the big table and this is exactly
  * Pregel-on-Spark; nothing is driver-side except the fixed iteration
  * count.
  *
  * Determinism: ranks live as fixed-point BIGINT (10^12 = 1.0). Each
  * edge contribution floors a double product — bit-identical operand
  * order in both engines — and the per-dst reduction then sums exact
  * integers, so a 1000-executor aggregation tree matches the oracle's
  * single-threaded sum.
  */
object GraphOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** The weighted trade adjacency: customer-nation → supplier-nation,
    * w = lineitem count. The 4-way fact join collapses to ≤ |nations|²
    * rows — the bounded graph every operator here iterates on. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).cast("long").as("w"))

  private val edgesSql: String =
    """SELECT c_nationkey AS src, s_nationkey AS dst, CAST(count(*) AS BIGINT) AS w
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY 1, 2"""

  /** 3 weighted-PageRank rounds (damping 0.85) over the trade graph:
    * nodes = nations, edges customer-nation → supplier-nation weighted
    * by lineitem count. The edge aggregation collapses the 100 TB fact
    * join to a bounded adjacency (≤ 625 rows here), cached for the
    * rounds; dangling mass is dropped identically in both engines (the
    * nation fan-out covers every node via the left join, so sinks decay
    * toward the teleport floor 0.15/N). */
  val q99_pagerank = QueryDef(
    "q99_pagerank",
    (s, dir) => {
      val edges = tradeEdges(s, dir).cache()
      val outw = edges.groupBy("src").agg(sum("w").cast("long").as("ow"))
      val ew = edges.join(outw, "src")
      val nodes = t(s, dir, "nation").select(col("n_nationkey").as("id"))
      val r0 = nodes.withColumn("r", lit(40000000000L)) // 10^12 / 25
      val r3 = (1 to 3).foldLeft(r0) { (rk, _) =>
        val contrib = ew.join(rk.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"),
            floor(col("r").cast("double") * lit(0.85) * col("w").cast("double")
              / col("ow").cast("double")).cast("long").as("c"))
          .groupBy("id").agg(sum("c").cast("long").as("m"))
        nodes.join(contrib, Seq("id"), "left")
          .select(col("id"), (lit(6000000000L) + coalesce(col("m"), lit(0L))).as("r"))
      }
      r3.select(col("id").as("nation_id"), col("r").as("pr_fp")).orderBy("nation_id")
    },
    Some {
      val round = (k: Int) =>
        s"""r$k AS (
              SELECT n.id, CAST(6000000000 + coalesce(s.m, 0) AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS id,
                       CAST(sum(CAST(floor(CAST(r.r AS DOUBLE) * 0.85 * CAST(e.w AS DOUBLE)
                         / CAST(o.ow AS DOUBLE)) AS BIGINT)) AS BIGINT) AS m
                FROM edges e JOIN r${k - 1} r ON r.id = e.src JOIN outw o ON o.src = e.src
                GROUP BY e.dst) s ON s.id = n.id)"""
      s"""WITH edges AS ($edgesSql),
          outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY src),
          nodes AS (SELECT n_nationkey AS id FROM nation),
          r0 AS (SELECT id, CAST(40000000000 AS BIGINT) AS r FROM nodes),
          ${round(1)},
          ${round(2)},
          ${round(3)}
          SELECT id AS nation_id, r AS pr_fp FROM r3 ORDER BY nation_id"""
    })

  /** 2-hop reachability profile: for each source nation, the number of
    * distinct nations reachable in exactly two trade hops and the total
    * 2-path weight Σ w₁·w₂. One self-join of the bounded adjacency on
    * the mid vertex — the multi-hop traversal shape (edges⋈edges on the
    * shared vertex, re-aggregate), which at 100 TB is the standard
    * distributed triangle/path-counting join, partition key = mid. */
  val q109_graph_2hop = QueryDef(
    "q109_graph_2hop",
    (s, dir) => {
      val edges = tradeEdges(s, dir).cache()
      val e1 = edges.select(col("src"), col("dst").as("mid"), col("w").as("w1"))
      val e2 = edges.select(col("src").as("mid"), col("dst"), col("w").as("w2"))
      e1.join(e2, "mid")
        .groupBy("src")
        .agg(countDistinct("dst").cast("long").as("n_2hop"),
          sum(col("w1") * col("w2")).cast("long").as("paths_w"))
        .orderBy("src")
    },
    Some(s"""WITH edges AS ($edgesSql)
            SELECT e1.src AS src,
                   CAST(count(DISTINCT e2.dst) AS BIGINT) AS n_2hop,
                   CAST(sum(e1.w * e2.w) AS BIGINT) AS paths_w
            FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
            GROUP BY e1.src ORDER BY src"""))

  def defs: Seq[QueryDef] = Seq(q99_pagerank, q109_graph_2hop)
}
