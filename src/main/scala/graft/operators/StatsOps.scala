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

  /** Skewness / excess kurtosis per return flag from EXACT raw moments —
    * the 3rd/4th-moment extension of q64's regression pattern: power
    * sums accumulate as DECIMAL(38,6) (order-independent; the powers of
    * the integral quantities are exact in double before the cast), the
    * shape statistics then derive with identical double operation order
    * in both engines, rounded one decimal short of the ulp where the
    * Σx⁴ magnitude can drift. One partial-aggregated pass. */
  val q106_moments = QueryDef(
    "q106_moments",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def m(c: org.apache.spark.sql.Column) = sum(c.cast(DecimalType(38, 6))).cast("double")
      val x = col("l_quantity")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          m(x).as("s1"), m(x * x).as("s2"),
          m(x * x * x).as("s3"), m(x * x * x * x).as("s4"))
        .withColumn("nd", col("n").cast("double"))
        .withColumn("mean", col("s1") / col("nd"))
        .withColumn("v", col("s2") / col("nd") - col("mean") * col("mean"))
        .withColumn("skew",
          round((col("s3") / col("nd") - lit(3.0) * col("mean") * (col("s2") / col("nd"))
            + lit(2.0) * col("mean") * col("mean") * col("mean")) / pow(col("v"), 1.5), 10))
        .withColumn("kurt",
          round((col("s4") / col("nd") - lit(4.0) * col("mean") * (col("s3") / col("nd"))
            + lit(6.0) * col("mean") * col("mean") * (col("s2") / col("nd"))
            - lit(3.0) * col("mean") * col("mean") * col("mean") * col("mean"))
            / (col("v") * col("v")) - lit(3.0), 10))
        .select(col("l_returnflag"), col("n"), round(col("mean"), 10).as("mean"),
          round(col("v"), 10).as("variance"), col("skew"), col("kurt"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (
              SELECT l_returnflag, count(*) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                     CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
                     CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3,
                     CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s4
              FROM lineitem GROUP BY l_returnflag),
            d AS (
              SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
                     s1 / CAST(n AS DOUBLE) AS mean,
                     s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS v,
                     s1, s2, s3, s4
              FROM m)
            SELECT l_returnflag, n,
                   round(mean, 10) AS mean,
                   round(v, 10) AS variance,
                   round((s3 / nd - 3.0 * mean * (s2 / nd)
                     + 2.0 * mean * mean * mean) / pow(v, 1.5), 10) AS skew,
                   round((s4 / nd - 4.0 * mean * (s3 / nd)
                     + 6.0 * mean * mean * (s2 / nd)
                     - 3.0 * mean * mean * mean * mean) / (v * v) - 3.0, 10) AS kurt
            FROM d ORDER BY l_returnflag"""))

  /** Two-sample Kolmogorov–Smirnov statistic (purchase vs error event
    * values) kept ENTIRELY in integers: KS = max |F₁−F₂| is computed as
    * max |cum₁·n₂ − cum₂·n₁| over the merged support, deferring the
    * division to a final ratio of exact BIGINTs — no per-row floating
    * point at all.
    *
    * DISTRIBUTED merged-support cumsum (round-7 WindowExec audit — the
    * former single global-ordered window put the whole distinct-value
    * support in one partition): values bucket by floor(value), a
    * monotone, value-bounded key, so each running sum decomposes into
    * an intra-bucket window after one hash shuffle on the bucket plus
    * an exclusive prefix over the bounded per-bucket totals (broadcast
    * back) — the q150/q74 device; identical values, oracle unchanged. */
  val q107_ks_test = QueryDef(
    "q107_ks_test",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "error"))
      val per = ev.groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("c2"))
        .withColumn("b", floor(col("value")).cast("long"))
      val wIn = Window.partitionBy("b").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPre = Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1) // bounded: one row per bucket
      val pre = per.groupBy("b")
        .agg(sum("c1").as("b1"), sum("c2").as("b2"))
        .withColumn("p1", coalesce(sum("b1").over(wPre), lit(0L)))
        .withColumn("p2", coalesce(sum("b2").over(wPre), lit(0L)))
        .select("b", "p1", "p2")
      per
        .join(broadcast(pre), "b")
        .withColumn("cum1", col("p1") + sum("c1").over(wIn))
        .withColumn("cum2", col("p2") + sum("c2").over(wIn))
        .crossJoin(per.agg(sum("c1").cast("long").as("n1"), sum("c2").cast("long").as("n2")))
        .select(abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("d"),
          col("n1"), col("n2"))
        .groupBy("n1", "n2")
        .agg(max("d").cast("long").as("ks_num"))
        .select(col("n1"), col("n2"), col("ks_num"),
          round(col("ks_num").cast("double") / (col("n1").cast("double") * col("n2").cast("double")), 10).as("ks"))
        .orderBy("n1")
    },
    Some("""WITH ev AS (SELECT event_type, value FROM events
                        WHERE event_type IN ('purchase', 'error')),
            per AS (SELECT value,
                      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                      CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c2
                    FROM ev GROUP BY value),
            tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM per),
            cum AS (SELECT
                      sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum1,
                      sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum2
                    FROM per)
            SELECT n1, n2,
                   CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num,
                   round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 10) AS ks
            FROM cum CROSS JOIN tot
            GROUP BY n1, n2 ORDER BY n1"""))

  /** Chi-square contingency cells (event type × day-of-week): observed
    * counts vs independence expectation rt·ct/N, per-cell contribution
    * floored to fixed-point. Everything derives from three bounded
    * aggregations of the same pass (cells, row totals, column totals —
    * the totals join back by key, no second scan of the fact table at
    * scale since Spark reuses the shuffled cells). Spark's dayofweek is
    * 1-based Sunday; DuckDB's 0-based — the projection aligns them. */
  val q110_chi_square = QueryDef(
    "q110_chi_square",
    (s, dir) => {
      val cells = t(s, dir, "events")
        .select(col("event_type"), (dayofweek(col("ts")) - 1).as("dow"))
        .groupBy("event_type", "dow")
        .agg(count(lit(1)).cast("long").as("o"))
      val rt = cells.groupBy("event_type").agg(sum("o").cast("long").as("rt"))
      val ct = cells.groupBy("dow").agg(sum("o").cast("long").as("ct"))
      val n = cells.agg(sum("o").cast("long").as("n"))
      cells.join(rt, "event_type").join(ct, "dow").crossJoin(n)
        .withColumn("e",
          col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double"))
        .withColumn("chi_fp",
          floor((col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
            / col("e") * lit(1e6)).cast("long"))
        .select(col("event_type"), col("dow").cast("long").as("dow"), col("o"),
          round(col("e"), 10).as("e"), col("chi_fp"))
        .orderBy("event_type", "dow")
    },
    Some("""WITH cells AS (
              SELECT event_type, dayofweek(ts) AS dow, CAST(count(*) AS BIGINT) AS o
              FROM events GROUP BY 1, 2),
            rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
            ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
            n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
            SELECT event_type, CAST(dow AS BIGINT) AS dow, o,
                   round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 10) AS e,
                   CAST(floor((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS chi_fp
            FROM cells JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n
            ORDER BY event_type, dow"""))

  /** Tukey-fence outlier accounting after a join: quartiles of
    * l_quantity per order priority (exact percentiles — integral
    * quantities, so the 0.25-step interpolation is exact in binary),
    * fences at 1.5·IQR, then one pass counting rows outside. The
    * quartile table is bounded (one row per priority) and broadcasts
    * into the counting scan; the fact table is never shuffled twice. */
  val q118_iqr_outliers = QueryDef(
    "q118_iqr_outliers",
    (s, dir) => {
      val joined = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), col("l_quantity"))
      val q = joined.groupBy("o_orderpriority")
        .agg(expr("percentile(l_quantity, 0.25)").as("q1"),
          expr("percentile(l_quantity, 0.75)").as("q3"))
      joined.join(q, "o_orderpriority")
        .withColumn("out_lo", col("l_quantity") < col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("out_hi", col("l_quantity") > col("q3") + lit(1.5) * (col("q3") - col("q1")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("out_lo") || col("out_hi"), 1L).otherwise(0L)).cast("long").as("n_outliers"),
          max("q1").as("q1"), max("q3").as("q3"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH joined AS (
              SELECT o_orderpriority, l_quantity
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            q AS (
              SELECT o_orderpriority,
                     quantile_cont(l_quantity, 0.25) AS q1,
                     quantile_cont(l_quantity, 0.75) AS q3
              FROM joined GROUP BY o_orderpriority)
            SELECT j.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN l_quantity < q1 - 1.5 * (q3 - q1)
                                   OR l_quantity > q3 + 1.5 * (q3 - q1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   max(q1) AS q1, max(q3) AS q3
            FROM joined j JOIN q USING (o_orderpriority)
            GROUP BY j.o_orderpriority ORDER BY o_orderpriority"""))

  def defs: Seq[QueryDef] = Seq(q97_histogram, q98_mode_per_group, q103_percentile_gate,
    q106_moments, q107_ks_test, q110_chi_square, q118_iqr_outliers)
}
