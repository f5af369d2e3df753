package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Cross-domain analytics operators: entity resolution, embedding
  * quantization, streaming-shaped time-series analysis (anomaly
  * detection, gap-fill) and semi-structured VARIANT ingestion.
  *
  * Determinism: windowed/grouped numeric accumulation routes through
  * DECIMAL (exact regardless of the engine's aggregation tree — DuckDB
  * uses segment-tree windowed sums, Spark streams the frame; only exact
  * arithmetic makes those agree) or fixed-point BIGINT; the final
  * floating-point comparisons then run on bit-identical operands.
  */
object AnalyticsOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Entity resolution via BLOCKED fuzzy matching: parts are blocked on
    * p_size, candidate pairs take a length prefilter, survivors take the
    * exact Levenshtein gate (≤ 2), and each part resolves to the
    * smallest matching partkey as its canonical id (every part matches
    * itself at distance 0, so the output is total over parts).
    *
    * The scale shape of record linkage: never all-pairs — the block
    * equi-join bounds candidates to block-mates, the cheap length filter
    * runs before the O(|a|·|b|) edit distance, and at a 100 TB corpus
    * the block key just gets more selective (size × brand × name
    * prefix), which changes ONE join key, not the plan. */
  val q88_entity_resolution = QueryDef(
    "q88_entity_resolution",
    (s, dir) => {
      val p = t(s, dir, "part")
      // PassJoin pigeonhole prefilter (round-15, guide §3.2 "reduce the
      // candidates before the expensive predicate"): split a_name into 3
      // contiguous pieces — ≤2 edit operations can touch at most 2 of
      // them, so any pair within edit distance 2 has ≥1 piece of a_name
      // appearing VERBATIM (contiguously, position-shifted at most) in
      // b_name. `contains` is a necessary condition ⇒ the survivor set
      // of the levenshtein gate is unchanged; the banded DP just runs
      // on the few pairs sharing a piece (A/B numbers in
      // OPTIMIZATION_r15.md). Pieces are projected on the
      // build side BEFORE the join so each candidate pair pays 3
      // short `contains` probes (short-circuiting), not 3 substring
      // builds. Empty pieces (len<3 names — none in TPC-H) trivially
      // pass, keeping the filter total.
      val aSide = p.select(col("p_partkey").as("a_key"), col("p_size"), col("p_name").as("a_name"))
        .withColumn("a_p1", substring(col("a_name"), lit(1), (length(col("a_name")) / 3).cast("int")))
        .withColumn("a_p2", expr("substring(a_name, CAST(length(a_name)/3 AS INT) + 1, " +
          "CAST(length(a_name)/3 AS INT))"))
        .withColumn("a_p3", expr("substring(a_name, 2 * CAST(length(a_name)/3 AS INT) + 1, " +
          "length(a_name) - 2 * CAST(length(a_name)/3 AS INT))"))
      val b = p.select(col("p_partkey").as("b_key"), col("p_size"), col("p_name").as("b_name"))
      // levenshtein's 3-arg threshold form runs the banded DP — O(len·k)
      // per pair instead of O(len²), ~2x on this block join — and
      // returns -1 past the bound, so the predicate set is identical to
      // the oracle's unbounded `levenshtein() <= 2`.
      aSide.join(b, "p_size")
        .filter(col("b_key") <= col("a_key")
          && abs(length(col("a_name")) - length(col("b_name"))) <= 2
          && (col("b_name").contains(col("a_p1"))
            || col("b_name").contains(col("a_p2"))
            || col("b_name").contains(col("a_p3")))
          && levenshtein(col("a_name"), col("b_name"), 2) =!= -1)
        .groupBy(col("a_key").as("p_partkey"))
        .agg(min("b_key").cast("long").as("canon_id"),
          count(lit(1)).cast("long").as("n_matches"))
        .orderBy("p_partkey")
    },
    Some("""SELECT a.p_partkey AS p_partkey,
                   CAST(min(b.p_partkey) AS BIGINT) AS canon_id,
                   CAST(count(*) AS BIGINT) AS n_matches
            FROM part a JOIN part b
              ON a.p_size = b.p_size AND b.p_partkey <= a.p_partkey
            WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
              AND levenshtein(a.p_name, b.p_name) <= 2
            GROUP BY a.p_partkey ORDER BY p_partkey"""))

  /** Int8 scalar quantization of the embedding column with per-vector
    * reconstruction error — the compression step before an ANN index
    * ships to serving. Per-dimension min/max are exact float aggregates;
    * each component quantizes to ⌊(x−mn)/scale⌋ clamped to 255 and the
    * squared reconstruction error accumulates fixed-point (floor(e²·10¹²)
    * as BIGINT, order-free). Linear: one explode, one bounded (64-key)
    * aggregate, one join back. */
  val q89_embedding_quantize = QueryDef(
    "q89_embedding_quantize",
    (s, dir) => {
      val dims = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding"))).toDF("vec_id", "i", "x")
      val mm = dims.groupBy("i").agg(min("x").as("mn"), max("x").as("mx"))
      dims.join(mm, "i")
        .withColumn("xd", col("x").cast("double"))
        .withColumn("mnd", col("mn").cast("double"))
        .withColumn("mxd", col("mx").cast("double"))
        .withColumn("scale", (col("mxd") - col("mnd")) / 255.0)
        .withColumn("qv", least(
          floor((col("xd") - col("mnd")) / ((col("mxd") - col("mnd")) / 255.0)).cast("double"),
          lit(255.0)))
        .withColumn("e", col("xd") - (col("mnd") + col("qv") * col("scale")))
        .withColumn("err_fp", when(col("mn") === col("mx"), lit(0L))
          .otherwise(floor(col("e") * col("e") * 1e12).cast("long")))
        .groupBy("vec_id").agg(sum("err_fp").cast("long").as("mse_fp"))
        .orderBy("vec_id")
    },
    Some("""WITH dims AS (
              SELECT vec_id, CAST(i AS INT) AS i, embedding[CAST(i+1 AS INT)] AS x
              FROM embeddings, unnest(range(64)) AS t(i)),
            mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dims GROUP BY i),
            j AS (SELECT vec_id, mn, mx,
                    CAST(x AS DOUBLE) AS xd, CAST(mn AS DOUBLE) AS mnd, CAST(mx AS DOUBLE) AS mxd
                  FROM dims JOIN mm USING(i)),
            e AS (SELECT vec_id, mn, mx, xd, mnd,
                    (mxd - mnd) / 255.0 AS scale,
                    least(CAST(floor((xd - mnd) / ((mxd - mnd) / 255.0)) AS DOUBLE), 255.0) AS qv
                  FROM j),
            f AS (SELECT vec_id,
                    CASE WHEN mn = mx THEN CAST(0 AS BIGINT)
                         ELSE CAST(floor((xd - (mnd + qv * scale)) * (xd - (mnd + qv * scale)) * 1e12) AS BIGINT)
                    END AS err_fp
                  FROM e)
            SELECT vec_id, CAST(sum(err_fp) AS BIGINT) AS mse_fp
            FROM f GROUP BY vec_id ORDER BY vec_id"""))

  /** Rolling z-score anomaly detection over the event stream: each
    * event's value against the mean/variance of its user's previous 20
    * events (a trailing frame — the streaming shape, no peeking). The
    * flag tests (x−μ)² > 9σ² with μ,σ² from EXACT decimal window sums,
    * evaluated in double on bit-identical operands — no per-engine
    * accumulation order anywhere. n ≥ 10 suppresses cold-start noise. */
  val q90_anomaly_zscore = QueryDef(
    "q90_anomaly_zscore",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      val vd = col("value").cast("decimal(18,2)")
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          count(lit(1)).over(w).as("n"),
          sum(vd).over(w).as("s1"),
          sum(vd * vd).over(w).as("s2"))
        .withColumn("anomalous",
          col("n") >= 10 &&
            (col("n").cast("double") * col("value") - col("s1").cast("double"))
              * (col("n").cast("double") * col("value") - col("s1").cast("double"))
            > lit(9.0) * (col("n").cast("double") * col("s2").cast("double")
              - col("s1").cast("double") * col("s1").cast("double")))
        .select(col("event_id"), col("user_id"), col("value"),
          col("n").cast("long").as("n"), col("anomalous"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, value, CAST(n AS BIGINT) AS n,
                   n >= 10 AND
                     (CAST(n AS DOUBLE) * value - CAST(s1 AS DOUBLE))
                       * (CAST(n AS DOUBLE) * value - CAST(s1 AS DOUBLE))
                     > 9.0 * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS anomalous
            FROM (
              SELECT event_id, user_id, value,
                     count(*) OVER w AS n,
                     sum(CAST(value AS DECIMAL(18,2))) OVER w AS s1,
                     sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS s2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
            ORDER BY event_id"""))

  /** Time-series gap-fill: per-user daily activity re-gridded onto the
    * full date spine (sequence/generate_series), missing days zero-filled,
    * plus a forward-carried "last active day" (running max over a
    * conditional — the standard forward-fill trick without an explicit
    * LAST_VALUE IGNORE NULLS). The spine join is users × days — bounded
    * by calendar length, not event count; daily amounts are exact
    * DECIMAL sums emitted as DOUBLE. */
  val q91_timeseries_gapfill = QueryDef(
    "q91_timeseries_gapfill",
    (s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") < 50)
        .withColumn("dt", to_date(col("ts")))
      val bounds = ev.agg(min("dt").as("d0"), max("dt").as("d1"))
      val users = ev.select("user_id").distinct()
      val spine = users.crossJoin(bounds)
        .select(col("user_id"), explode(expr("sequence(d0, d1, interval 1 day)")).as("dt"))
      val daily = ev.groupBy("user_id", "dt")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("amt"))
      spine.join(daily, Seq("user_id", "dt"), "left")
        .select(col("user_id"), col("dt"),
          coalesce(col("n"), lit(0)).cast("long").as("n_events"),
          coalesce(col("amt"), lit(0.0)).as("amount"))
        .withColumn("last_active_day",
          max(when(col("n_events") > 0, col("dt")))
            .over(Window.partitionBy("user_id").orderBy("dt")))
        .orderBy("user_id", "dt")
    },
    Some("""WITH ev AS (SELECT user_id, ts::DATE AS dt, value FROM events WHERE user_id < 50),
            bounds AS (SELECT min(dt) AS d0, max(dt) AS d1 FROM ev),
            users AS (SELECT DISTINCT user_id FROM ev),
            spine AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS dt
                      FROM users CROSS JOIN bounds),
            daily AS (SELECT user_id, dt, count(*) AS n,
                             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS amt
                      FROM ev GROUP BY 1, 2)
            SELECT user_id, dt, n_events, amount,
                   max(CASE WHEN n_events > 0 THEN dt END)
                     OVER (PARTITION BY user_id ORDER BY dt) AS last_active_day
            FROM (SELECT s.user_id, s.dt,
                         CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
                         coalesce(d.amt, 0.0) AS amount
                  FROM spine s LEFT JOIN daily d
                    ON d.user_id = s.user_id AND d.dt = s.dt)
            ORDER BY user_id, dt"""))

  /** Semi-structured ingestion via Spark 4 VARIANT: `props` parses once
    * into the binary variant encoding (`parse_json`), fields project out
    * with `variant_get` path extraction — the open-schema path for event
    * payloads whose shape isn't known at write time (vs q30's
    * fixed-schema `from_json`). Variant decoding is columnar and
    * shredding-friendly at scale; the oracle reads the same paths with
    * DuckDB's JSON operators. */
  val q93_variant_ingest = QueryDef(
    "q93_variant_ingest",
    (s, dir) => t(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k_val"),
        expr("variant_get(v, '$.k', 'bigint') % 10").as("k_bucket"),
        (expr("variant_get(v, '$.k', 'bigint')") >= 50).as("is_big"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
                   CAST(props->>'$.k' AS BIGINT) AS k_val,
                   CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
                   CAST(props->>'$.k' AS BIGINT) >= 50 AS is_big
            FROM events ORDER BY event_id"""))

  /** First-order Markov transition matrix over each user's event
    * sequence: lead() pairs consecutive event types per user (one
    * window pass, partitioned on user_id), then a bounded aggregation
    * over the |types|² matrix with integer-exact conditional
    * probabilities (c·10⁶ div row-total). The behavioral-model shape:
    * the fact table is touched once; everything after is bounded. */
  val q117_transition_matrix = QueryDef(
    "q117_transition_matrix",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("nxt", lead("event_type", 1).over(w))
        .filter(col("nxt").isNotNull)
      val counts = pairs.groupBy("event_type", "nxt")
        .agg(count(lit(1)).cast("long").as("c"))
      val totals = counts.groupBy("event_type").agg(sum("c").cast("long").as("rt"))
      counts.join(totals, "event_type")
        .select(col("event_type"), col("nxt"), col("c"),
          expr("c * 1000000 div rt").as("p_fp"))
        .orderBy("event_type", "nxt")
    },
    Some("""WITH pairs AS (
              SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
              FROM events),
            counts AS (
              SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS c
              FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2),
            totals AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS rt
                       FROM counts GROUP BY 1)
            SELECT event_type, nxt, c, CAST(c * 1000000 // rt AS BIGINT) AS p_fp
            FROM counts JOIN totals USING (event_type)
            ORDER BY event_type, nxt"""))

  override val defs: Seq[QueryDef] = Seq(
    q88_entity_resolution, q89_embedding_quantize, q90_anomaly_zscore,
    q91_timeseries_gapfill, q93_variant_ingest, q117_transition_matrix)
}
