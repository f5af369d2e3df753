package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distribution-shape operators: equi-width histograms, per-group mode,
  * and percentile-threshold gating — the "look at the data before you
  * train on it" layer of a corpus pipeline.
  *
  * Scale shapes: the histogram is two linear passes (global bounds, then
  * a 20-key aggregation — the bounds row broadcasts); mode is a bounded
  * two-level aggregation; the percentile gate is one window pass per
  * stratum. Bin/score arithmetic is written with the identical operation
  * order in both engines (QueryDef determinism rules), so the doubles
  * being compared are bit-identical.
  */
object StatsOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Equi-width histogram (20 bins) of l_extendedprice between the
    * global min/max. The bounds aggregate is one row — Catalyst
    * broadcasts it into the scan-side projection — and the bin id is
    * exact double arithmetic shared by both engines; the top bin is
    * closed so x = max lands in bin 19, not a bin of its own. */
  val q97_histogram = QueryDef(
    "q97_histogram",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
      val bounds = li.agg(min("x").as("mn"), max("x").as("mx"))
      li.crossJoin(bounds)
        .withColumn("bin",
          least(floor((col("x") - col("mn")) * lit(20.0) / (col("mx") - col("mn"))), lit(19.0))
            .cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).cast("long").as("n"))
        .crossJoin(bounds)
        .withColumn("bin_lo",
          col("bin").cast("double") * (col("mx") - col("mn")) / lit(20.0) + col("mn"))
        .select(col("bin"), col("bin_lo"), col("n"))
        .orderBy("bin")
    },
    Some("""WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
            bounds AS (SELECT min(x) AS mn, max(x) AS mx FROM v),
            binned AS (
              SELECT CAST(least(floor((x - mn) * 20.0 / (mx - mn)), 19.0) AS BIGINT) AS bin
              FROM v CROSS JOIN bounds)
            SELECT bin,
                   CAST(bin AS DOUBLE) * (mx - mn) / 20.0 + mn AS bin_lo,
                   CAST(count(*) AS BIGINT) AS n
            FROM binned CROSS JOIN bounds
            GROUP BY bin, mn, mx ORDER BY bin"""))

  /** Per-group MODE: the most frequent order priority per market
    * segment (ties break to the lexicographically smallest value, so the
    * answer is total and deterministic). Two bounded aggregations — the
    * (segment, priority) count space is tiny regardless of fact-table
    * size — then a 1-row-per-group argmax window over that bounded
    * set. */
  val q98_mode_per_group = QueryDef(
    "q98_mode_per_group",
    (s, dir) => {
      val counts = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("n").desc, col("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH counts AS (
              SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2),
            ranked AS (
              SELECT c_mktsegment, o_orderpriority, n,
                     row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY n DESC, o_orderpriority) AS rn
              FROM counts)
            SELECT c_mktsegment, o_orderpriority AS mode_priority, n
            FROM ranked WHERE rn = 1 ORDER BY c_mktsegment"""))

  /** Percentile-threshold quality gate: keep documents at or above the
    * 75th percentile of chars-per-token within their language. The
    * score is exact integer fixed-point (chars·1000 div tokens) and the
    * rank position is fully tie-broken by doc_id, so the percent_rank
    * double is a ratio of identical integers in both engines. One
    * window pass per language stratum; only survivors leave the
    * stage. */
  val q103_percentile_gate = QueryDef(
    "q103_percentile_gate",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          expr("n_chars * 1000 div size(split(text, ' '))").as("score_fp"))
      val w = Window.partitionBy("lang").orderBy("score_fp", "doc_id")
      d.withColumn("pr", percent_rank().over(w))
        .filter(col("pr") >= 0.75)
        .select(col("doc_id"), col("lang"), col("score_fp"), col("pr"))
        .orderBy("lang", "score_fp", "doc_id")
    },
    Some("""WITH scored AS (
              SELECT doc_id, lang,
                     CAST(n_chars * 1000 // len(string_split(text, ' ')) AS BIGINT) AS score_fp
              FROM documents),
            ranked AS (
              SELECT doc_id, lang, score_fp,
                     percent_rank() OVER (PARTITION BY lang
                       ORDER BY score_fp, doc_id) AS pr
              FROM scored)
            SELECT doc_id, lang, score_fp, pr
            FROM ranked WHERE pr >= 0.75
            ORDER BY lang, score_fp, doc_id"""))

  def defs: Seq[QueryDef] = Seq(q97_histogram, q98_mode_per_group, q103_percentile_gate)
}
