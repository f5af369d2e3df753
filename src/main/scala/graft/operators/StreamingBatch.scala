package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Subjects
import graft.sources.Tables

/** Batch-verifiable forms of the streaming operator surface
  * (SURVEY.md §2.2 "Streaming" rows). The exact same expressions run
  * under `readStream` in graft.streaming; here they run over the
  * `events` table so the DuckDB oracle can pin their semantics
  * (window assignment, session merging, keep-first dedup, fan-out).
  *
  * Window-start columns are emitted as epoch seconds (BIGINT): the
  * source timestamps are nanosecond-precision parquet, and an integral
  * output dodges engine-dependent sub-microsecond representation.
  */
object StreamingBatch extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val q32_window_tumbling = QueryDef(
    "q32_window_tumbling",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("total"))
      .orderBy("wstart", "event_type"),
    Some("""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart,
            event_type, count(*) AS n,
            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM events GROUP BY 1, 2 ORDER BY wstart, event_type"""))

  /** Sliding window (2h size, 1h slide): every event lands in two
    * windows; the oracle materializes the same assignment by unnesting
    * the two candidate starts. */
  val q33_window_sliding = QueryDef(
    "q33_window_sliding",
    (s, dir) => t(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(unix_timestamp(col("window.start")).as("wstart"), col("n"), col("total"))
      .orderBy("wstart"),
    Some("""WITH assigned AS (
              SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
                     value
              FROM events)
            SELECT CAST(floor(epoch(ws)) AS BIGINT) AS wstart, count(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM assigned GROUP BY ws ORDER BY wstart"""))

  /** Session window, 30-minute gap, keyed by user. Spark's
    * `session_window` merges an event into the open session while
    * ts < session_end (= last_ts + gap); the oracle reproduces that
    * with the classic gaps-and-islands cumulative-sum. */
  val q34_window_session = QueryDef(
    "q34_window_session",
    (s, dir) => t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("sstart"),
        col("n"), col("total"))
      .orderBy("user_id", "sstart"),
    Some("""WITH marked AS (
              SELECT user_id, ts, value,
                CASE WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE OR
                          lag(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sessions AS (
              SELECT user_id, ts, value,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM marked)
            SELECT user_id,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS sstart,
                   count(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
            FROM sessions GROUP BY user_id, sid ORDER BY user_id, sstart"""))

  /** Streaming dedup semantics (`withWatermark + dropDuplicates`):
    * keep the first event per key in event-time order. Deterministic
    * batch form = row_number over (ts, event_id). */
  val q35_dedup_keepfirst = QueryDef(
    "q35_dedup_keepfirst",
    (s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("first_sec"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, event_id,
            CAST(floor(epoch(ts)) AS BIGINT) AS first_sec
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS rn FROM events)
            WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** The reference's R2+R4 fan-out (subject construction + 1→N
    * multicast) over real data: events are mapped onto a synthetic
    * resource hierarchy, each produces its publish-subject set per
    * natsio.rs:78-129 (collection events → 1 subject; object events →
    * object-group subjects plus own subject), then explode + count per
    * subject — exactly the engine's ingest path, batch-verified. */
  /** Events mapped onto the synthetic resource hierarchy and exploded
    * to their publish-subject sets (natsio.rs:78-129) — shared by q36
    * (fan-out census) and q149 (wildcard filters). */
  private def fanoutSubjects(s: SparkSession, dir: String): DataFrame = {
    // widen (round 15): on single-file rehearsal fixtures the events
    // scan is ⌈bytes/maxPartitionBytes⌉ = 1–2 splits, so the fan-out
    // explode + candidate-key join (q204) serialized on 2 of 32 cores
    // at 100×. Gated on measured split count — a literal no-op at
    // multi-file scale (Tables.widen scaladoc, the q201 device).
    val e = graft.sources.Tables.widen(t(s, dir, "events"))
      .withColumn("project", concat(lit("p"), (col("user_id") % 5).cast("string")))
      .withColumn("collection", concat(lit("c"), col("user_id").cast("string")))
    val objectSubj = Subjects.objectSubjectCol(col("project"), col("collection"),
      concat(lit("s"), col("event_id").cast("string")),
      concat(lit("o"), col("event_id").cast("string")))
    val groupSubj = Subjects.objectGroupSubjectCol(col("project"), col("collection"),
      concat(lit("g"), (col("user_id") % 3).cast("string")),
      concat(lit("o"), col("event_id").cast("string")))
    val subjects = when(col("event_type") === "signup",
        array(Subjects.projectSubjectCol(col("project"))))
      .when(col("event_type") === "purchase",
        array(Subjects.collectionSubjectCol(col("project"), col("collection"))))
      .otherwise(array(groupSubj, objectSubj)) // object event: group subjects + own
    e.select(col("event_id"), explode(subjects).as("subject"))
  }

  /** DuckDB mirror of [[fanoutSubjects]] (the q36 base+subj CTEs). */
  private val fanoutSubjSql =
    """base AS (
              SELECT event_id, event_type,
                     'p' || CAST(user_id % 5 AS VARCHAR) AS project,
                     'c' || CAST(user_id AS VARCHAR) AS collection,
                     'g' || CAST(user_id % 3 AS VARCHAR) AS grp,
                     's' || CAST(event_id AS VARCHAR) AS shared,
                     'o' || CAST(event_id AS VARCHAR) AS obj
              FROM events),
            subj AS (
              SELECT event_id, unnest(
                CASE WHEN event_type = 'signup'
                     THEN ['UPDATES.STORAGE._.' || project || '._']
                     WHEN event_type = 'purchase'
                     THEN ['UPDATES.STORAGE._.' || project || '._.' || collection || '._']
                     ELSE ['UPDATES.STORAGE._.' || project || '._.' || collection ||
                           '._.OBJECTGROUP._.' || grp || '._.' || obj || '._',
                           'UPDATES.STORAGE._.' || project || '._.' || collection ||
                           '._.OBJECT._.' || shared || '._.' || obj || '._']
                END) AS subject
              FROM base)"""

  val q36_subject_fanout = QueryDef(
    "q36_subject_fanout",
    (s, dir) => {
      fanoutSubjects(s, dir)
        .withColumn("level2", substring_index(col("subject"), "._.", 3))
        .groupBy("level2").agg(count(lit(1)).as("n"),
          countDistinct(col("subject")).as("n_subjects"))
        .orderBy("level2")
    },
    Some(s"""WITH $fanoutSubjSql
            SELECT CASE WHEN len(string_split(subject, '._.')) >= 3
                        THEN string_split(subject, '._.')[1] || '._.' ||
                             string_split(subject, '._.')[2] || '._.' ||
                             string_split(subject, '._.')[3]
                        ELSE subject END AS level2,
                   count(*) AS n,
                   count(DISTINCT subject) AS n_subjects
            FROM subj GROUP BY 1 ORDER BY level2"""))

  /** Funnel conversion over the event stream: users who sign up,
    * cohorted by signup day, and whether a purchase follows within 24
    * hours. Two linear passes (first-signup argmin per user; qualifying
    * purchases via a range-bounded join that prunes like q66) and one
    * small cohort aggregation — no per-user window sort over the whole
    * stream. The conversion rate divides two exact BIGINTs, so the
    * double is bit-identical everywhere. */
  val q67_funnel = QueryDef(
    "q67_funnel",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("s_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val conv = su.join(pu,
        col("user_id") === col("p_user")
          && col("p_ts") >= col("s_ts")
          && col("p_ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"), "left")
        .groupBy("user_id")
        .agg(first(col("s_ts")).as("s_ts"),
          max(col("p_ts").isNotNull).as("converted"))
      conv.groupBy(to_date(col("s_ts")).as("cohort"))
        .agg(count(lit(1)).as("n_signups"),
          sum(col("converted").cast("long")).cast("long").as("n_converted"))
        .withColumn("conv_rate",
          col("n_converted").cast("double") / col("n_signups").cast("double"))
        .orderBy("cohort")
    },
    Some("""WITH su AS (
              SELECT user_id, min(ts) AS s_ts FROM events
              WHERE event_type = 'signup' GROUP BY user_id),
            pu AS (
              SELECT user_id AS p_user, ts AS p_ts FROM events
              WHERE event_type = 'purchase'),
            conv AS (
              SELECT su.user_id, min(su.s_ts) AS s_ts,
                     max(p.p_ts IS NOT NULL) AS converted
              FROM su LEFT JOIN pu p
                ON su.user_id = p.p_user
                AND p.p_ts >= su.s_ts
                AND p.p_ts <= su.s_ts + INTERVAL 24 HOUR
              GROUP BY su.user_id)
            SELECT CAST(s_ts AS DATE) AS cohort,
                   count(*) AS n_signups,
                   CAST(sum(CAST(converted AS BIGINT)) AS BIGINT) AS n_converted,
                   CAST(sum(CAST(converted AS BIGINT)) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS conv_rate
            FROM conv GROUP BY 1 ORDER BY cohort"""))

  /** Event-type-gated subscription matching (R7/R8 parity): the
    * reference declares an `event_type` per stream group
    * (storage_endpoint_mock.rs:32-38) though its tests only pass
    * `All`; here the declared gate is exercised. Six literal groups
    * (project filter × gate), events mapped to their publish subjects
    * as in q36, broadcast-joined on subject-prefix match AND
    * [[Subjects.eventTypeMatches]] (ALL admits everything, else exact
    * match) — the identical Column predicate the three streaming
    * delivery paths apply. Batch form so DuckDB pins the semantics. */
  val q69_eventtype_gate = QueryDef(
    "q69_eventtype_gate",
    (s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("project", concat(lit("p"), (col("user_id") % 5).cast("string")))
        .withColumn("subject", Subjects.objectSubjectCol(col("project"),
          concat(lit("c"), col("user_id").cast("string")),
          concat(lit("s"), col("event_id").cast("string")),
          concat(lit("o"), col("event_id").cast("string"))))
      val groups = s.createDataFrame(Seq(
        ("gA", "p0", "ALL"), ("gB", "p0", "purchase"), ("gC", "p1", "signup"),
        ("gD", "p2", "ALL"), ("gE", "p3", "view"), ("gF", "p4", "error")))
        .toDF("group_id", "g_project", "g_event_type")
      e.join(broadcast(groups),
          col("subject").startsWith(
            concat(lit("UPDATES.STORAGE._."), col("g_project"), lit("._")))
            && Subjects.eventTypeMatches(col("event_type"), col("g_event_type")))
        .groupBy("group_id", "g_event_type")
        .agg(count(lit(1)).as("n_delivered"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("group_id")
    },
    Some("""WITH e AS (
              SELECT event_id, user_id, event_type,
                     'p' || CAST(user_id % 5 AS VARCHAR) AS project
              FROM events),
            g(group_id, g_project, g_event_type) AS (
              VALUES ('gA','p0','ALL'), ('gB','p0','purchase'),
                     ('gC','p1','signup'), ('gD','p2','ALL'),
                     ('gE','p3','view'), ('gF','p4','error'))
            SELECT group_id, g_event_type,
                   count(*) AS n_delivered,
                   count(DISTINCT user_id) AS n_users
            FROM e JOIN g ON e.project = g.g_project
              AND (g.g_event_type = 'ALL' OR e.event_type = g.g_event_type)
            GROUP BY 1, 2 ORDER BY group_id"""))

  /** SCD-style validity intervals (change-data-capture → dimension
    * history): each user's event stream becomes [valid_from, valid_to)
    * rows via lead() over the per-user time order — the open (current)
    * row keeps a NULL valid_to. The warehouse pattern for replaying an
    * event log into slowly-changing-dimension state; one shuffle on the
    * entity key, map-side everything else. Epoch-seconds output dodges
    * ns-vs-µs timestamp representation (QueryDef determinism rules). */
  val q78_scd_intervals = QueryDef(
    "q78_scd_intervals",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("valid_from"),
          unix_timestamp(lead(col("ts"), 1).over(w)).as("valid_to"),
          (lead(col("ts"), 1).over(w).isNull).as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    },
    Some("""SELECT user_id, event_id, event_type,
            CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
            CAST(floor(epoch(lead(ts, 1) OVER w)) AS BIGINT) AS valid_to,
            lead(ts, 1) OVER w IS NULL AS is_current
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, valid_from, event_id"""))

  /** Retention cohort matrix — q67's sibling and the other half of
    * product analytics over an event stream: users cohorted by their
    * first-signup week, and for each week offset since, how many of the
    * cohort came back (any event). Two linear passes (first-signup
    * argmin; distinct user-week activity) meeting in one equi-join on
    * user, then a small matrix aggregation. Weeks are integral
    * epoch-week indices so the matrix is exact-typed end to end. */
  val q80_retention = QueryDef(
    "q80_retention",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("wk", floor(unix_timestamp(col("ts")) / 604800L).cast("long"))
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("wk").as("cohort_wk"))
      val active = ev.select("user_id", "wk").distinct()
      cohorts.join(active, "user_id")
        .filter(col("wk") >= col("cohort_wk"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_wk", "offset_wk")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_type,
                     CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
              FROM events),
            cohorts AS (
              SELECT user_id, min(wk) AS cohort_wk FROM ev
              WHERE event_type = 'signup' GROUP BY user_id),
            active AS (SELECT DISTINCT user_id, wk FROM ev)
            SELECT c.cohort_wk, a.wk - c.cohort_wk AS offset_wk,
                   count(DISTINCT c.user_id) AS n_active
            FROM cohorts c JOIN active a ON c.user_id = a.user_id
            WHERE a.wk >= c.cohort_wk
            GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk"""))

  /** WATERMARK LATE-DROP replay — the batch twin of
    * `withWatermark("10 minutes")` + 1-hour tumbling count
    * (StreamingWindowsSpec "watermark drops late rows"), making the
    * drop semantics oracle-visible, not just spec-visible. Arrival is
    * the same content-addressed interleave as q148; the watermark at
    * each arrival is the running max event-time over PRIOR arrivals
    * minus the delay, and an event is dropped when its window END ≤
    * watermark — exactly the state-eviction rule Structured Streaming
    * applies. This replays the trigger-per-record schedule (tightest
    * watermark; batch-boundary schedules drop a subset).
    *
    * DISTRIBUTED PREFIX MAX (round 6 — removes the round-5 verdict's
    * one serial-scan shape): the arrival key is the md5 hex string, so
    * its FIRST TWO CHARS split the global arrival order into 256
    * contiguous shards. The running max over prior arrivals then
    * decomposes exactly — max(prior within my shard, max over all
    * earlier shards) — into (a) a per-shard windowed max after one hash
    * shuffle on the shard byte, (b) a 256-row shard-maxima table whose
    * own exclusive prefix max is a bounded-keyspace window (the q74
    * per-shard prefix-sum pattern), broadcast back. No events-scale
    * global sort remains; the value — and therefore the oracle, which
    * keeps the single-scan formulation — is unchanged. */
  val q150_watermark_replay = QueryDef(
    "q150_watermark_replay",
    (s, dir) => {
      val base = t(s, dir, "events")
        .select(col("event_id"), col("ts"))
        .withColumn("m", md5(col("event_id").cast("string")))
        .withColumn("shard", substring(col("m"), 1, 2))
      val wIn = Window.partitionBy("shard").orderBy("m", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wShard = Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = base.groupBy("shard").agg(max(col("ts")).as("smax"))
        .withColumn("pmax", max(col("smax")).over(wShard)) // 256 rows: bounded
        .select("shard", "pmax")
      val prior0 = max(col("ts")).over(wIn)
      base.join(broadcast(prefix), "shard")
        .withColumn("prior",
          when(prior0.isNull, col("pmax"))
            .when(col("pmax").isNull, prior0)
            .otherwise(greatest(prior0, col("pmax"))))
        .withColumn("wm", col("prior") - expr("INTERVAL 10 MINUTES"))
        .filter(col("wm").isNull
          || date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR") > col("wm"))
        .groupBy(date_trunc("hour", col("ts")).as("ws"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("ws")).as("wstart"), col("n"))
        .orderBy("wstart")
    },
    Some("""WITH r AS (
              SELECT event_id, ts,
                     max(ts) OVER (ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       - INTERVAL 10 MINUTE AS wm
              FROM events)
            SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS wstart,
                   count(*) AS n
            FROM r
            WHERE wm IS NULL OR date_trunc('hour', ts) + INTERVAL 1 HOUR > wm
            GROUP BY 1 ORDER BY wstart"""))

  /** STATEFUL PER-KEY LEDGER replay — the batch twin of the
    * mapGroupsWithState delivery/ack ledger (StreamingWindowsSpec R12
    * in-stream form; TransformWithStateSpec is the Spark-4 variant).
    * Purchases play "deliver", errors play "ack"; the per-user state is
    * the running outstanding balance folded in event-time order. The
    * PEAK outstanding pins path dependence (it needs the running
    * sequence, not the totals), which is what distinguishes a stateful
    * fold from a plain aggregate — the oracle must walk the same
    * per-key sequence to match it. One shuffle on user_id; the
    * cumulative window and the final aggregate share it. */
  val q151_stateful_ledger_replay = QueryDef(
    "q151_stateful_ledger_replay",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "error"))
        .withColumn("delta",
          when(col("event_type") === "purchase", 1L).otherwise(-1L))
        .withColumn("bal", sum("delta").over(w))
        .groupBy("user_id")
        .agg(count(when(col("delta") === 1L, 1)).cast("long").as("n_deliver"),
          count(when(col("delta") === -1L, 1)).cast("long").as("n_ack"),
          sum("delta").cast("long").as("outstanding"),
          max("bal").cast("long").as("peak_outstanding"))
        .orderBy("user_id")
    },
    Some("""WITH led AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS delta
              FROM events WHERE event_type IN ('purchase', 'error')),
            walked AS (
              SELECT user_id, delta,
                     sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
              FROM led)
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_deliver,
                   CAST(count(*) FILTER (WHERE delta = -1) AS BIGINT) AS n_ack,
                   CAST(sum(delta) AS BIGINT) AS outstanding,
                   CAST(max(bal) AS BIGINT) AS peak_outstanding
            FROM walked GROUP BY user_id ORDER BY user_id"""))

  /** STREAM–STREAM LEFT OUTER interval join replay — the batch twin of
    * the watermarked attribution join (StreamingWindowsSpec
    * "stream-stream LEFT OUTER join emits unmatched rows after the
    * watermark closes the window"): signups (impressions) left-join
    * purchases (clicks) by user within 24 h. Once every watermark has
    * passed, the append-mode output of the streaming query is exactly
    * this batch join — matched pairs plus null-extended unmatched
    * impressions — so the oracle pins what the state-store symmetric
    * hash join must emit. Equi key user_id carries the shuffle; the
    * interval predicate is a residual filter (never a BNLJ). Nullable
    * click columns are COALESCE'd to -1 sentinels: Spark and DuckDB
    * order nulls differently, and the determinism contract demands a
    * total order. */
  val q152_ssjoin_replay = QueryDef(
    "q152_ssjoin_replay",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("imp_id"), col("ts").as("imp_ts"))
      val r = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("r_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      l.join(r, col("user_id") === col("r_user")
          && col("c_ts") >= col("imp_ts")
          && col("c_ts") <= col("imp_ts") + expr("INTERVAL 24 HOURS"), "left")
        .select(col("user_id"), col("imp_id"),
          unix_timestamp(col("imp_ts")).as("imp_sec"),
          coalesce(col("c_id"), lit(-1L)).as("click_id"),
          coalesce(unix_timestamp(col("c_ts")), lit(-1L)).as("click_sec"))
        .orderBy("user_id", "imp_id", "click_id")
    },
    Some("""WITH l AS (
              SELECT user_id, event_id AS imp_id, ts AS imp_ts
              FROM events WHERE event_type = 'signup'),
            r AS (
              SELECT user_id AS r_user, event_id AS c_id, ts AS c_ts
              FROM events WHERE event_type = 'purchase')
            SELECT l.user_id, l.imp_id,
                   CAST(floor(epoch(l.imp_ts)) AS BIGINT) AS imp_sec,
                   COALESCE(r.c_id, -1) AS click_id,
                   COALESCE(CAST(floor(epoch(r.c_ts)) AS BIGINT), -1) AS click_sec
            FROM l LEFT JOIN r
              ON l.user_id = r.r_user
             AND r.c_ts >= l.imp_ts AND r.c_ts <= l.imp_ts + INTERVAL 24 HOUR
            ORDER BY user_id, imp_id, click_id"""))

  /** NATS WILDCARD query surface — the `*` arm of `matchesLit`
    * (Subjects.scala `wildcardRegex`; R3 beyond the reference's own
    * grammar, which never emits `*`): three broker-style filters — a
    * `*` project token, a `*`-project collection filter, and a `*`+`>`
    * combination — evaluated over the q36 fan-out subjects. Spark runs
    * the anchored wildcardRegex as an `rlike`; the oracle states the
    * equivalent RE2 regex literally (Java's \Q…\E quoting and RE2
    * differ in syntax, not in the matched language, for these alnum
    * tokens). The wildcard-free fast path stays pushable
    * equality/prefix — PlanSpec pins that the regex engine is reserved
    * for genuine wildcards. */
  val q149_wildcard_match = QueryDef(
    "q149_wildcard_match",
    (s, dir) => {
      val subj = fanoutSubjects(s, dir)
      val wqs = Seq(
        "UPDATES.STORAGE._.*._",
        "UPDATES.STORAGE._.*._.c7._",
        "UPDATES.STORAGE._.*._.*._.OBJECT.>")
      wqs.map { q =>
        subj.filter(Subjects.matchesLit(col("subject"), q))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("subject")).as("n_subjects"))
          .select(lit(q).as("wq"), col("n"), col("n_subjects"))
      }.reduce(_ unionByName _).orderBy("wq")
    },
    Some("WITH " + fanoutSubjSql + """
            SELECT 'UPDATES.STORAGE._.*._' AS wq, count(*) AS n,
                   count(DISTINCT subject) AS n_subjects
            FROM subj
            WHERE regexp_matches(subject, '^UPDATES\.STORAGE\._\.[^.]+\._$')
            UNION ALL
            SELECT 'UPDATES.STORAGE._.*._.c7._' AS wq, count(*) AS n,
                   count(DISTINCT subject) AS n_subjects
            FROM subj
            WHERE regexp_matches(subject, '^UPDATES\.STORAGE\._\.[^.]+\._\.c7\._$')
            UNION ALL
            SELECT 'UPDATES.STORAGE._.*._.*._.OBJECT.>' AS wq, count(*) AS n,
                   count(DISTINCT subject) AS n_subjects
            FROM subj
            WHERE regexp_matches(subject,
              '^UPDATES\.STORAGE\._\.[^.]+\._\.[^.]+\._\.OBJECT\..+$')
            ORDER BY wq"""))

  /** MULTI-HIERARCHY subscription matching (round-12 verdict task 5 —
    * the R7 arm the reference truncates to `hierarchies[0]`,
    * public_event_server.rs:145-152) as an oracle-checked batch twin:
    * three subscriptions, each a UNION of filter subjects (one per
    * hierarchy), matched against the q36 fan-out messages with the
    * ENGINE's exact join shape — since round 14 the pure candidate-key
    * equi-join ([[Subjects.matchKeysCol]]: each subject explodes into
    * one key per distinct subtree depth + its exact form; broadcast
    * hash join on key equality, zero residual matching — the O(G)-free
    * form both mux engines run). The oracle is unchanged: the equi-join
    * is match-for-match the old residual form, so this query doubles as
    * the fixture-scale pin of that equivalence. The
    * deliver-ONCE rule is stated as arithmetic the oracle re-derives:
    * `n_msgs` = distinct matched messages (what the engines deliver
    * after their per-message dedup), `n_dup_suppressed` = raw join
    * matches minus that (the rows a message matching two of one
    * group's matchers would have duplicated) — positive exactly for
    * the overlapping subscription, zero for disjoint unions. */
  val q204_subject_union = QueryDef(
    "q204_subject_union",
    (s, dir) => {
      val subs = Seq(
        // overlapping matchers: the p2 subtree CONTAINS the c7 exact
        // subject (user 7 hashes to project p2) — dedup must fire
        ("sub_overlap", "UPDATES.STORAGE._.p2.>"),
        ("sub_overlap", "UPDATES.STORAGE._.p2._.c7._"),
        // disjoint union across two projects — zero overlap
        ("sub_two_projects", "UPDATES.STORAGE._.p0._"),
        ("sub_two_projects", "UPDATES.STORAGE._.p1._"),
        // three hierarchies, two collections + a whole-project subtree
        ("sub_three", "UPDATES.STORAGE._.p3._.c3._"),
        ("sub_three", "UPDATES.STORAGE._.p3._.c8._"),
        ("sub_three", "UPDATES.STORAGE._.p4.>"))
      val subDf = s.createDataFrame(subs).toDF("sub_id", "joinKey")
      val depths = subs.map(_._2).flatMap(Subjects.subtreeDepth).distinct.sorted
      // TWO-LEVEL aggregation (round 14, guide §2.3): the previous
      // two-distinct agg planned as an Expand that TRIPLED the
      // candidate-key-exploded stream through the shuffle (the 100×
      // bench's one regression row). Grouping to the per-message grain
      // first is the engine's own dedup step stated as aggregation:
      // n_msgs = the (sub, event, subject) group count, n_matches = Σ
      // raw matches, and the one remaining distinct (subjects) runs
      // over the deduped message set. Values bit-identical.
      fanoutSubjects(s, dir)
        .withColumn("joinKey",
          explode(Subjects.matchKeysCol(col("subject"), depths)))
        .join(broadcast(subDf), "joinKey")
        .groupBy("sub_id", "event_id", "subject")
        .agg(count(lit(1)).as("c"))
        .groupBy("sub_id")
        .agg(sum("c").as("n_matches"),
          count(lit(1)).as("n_msgs"),
          countDistinct(col("subject")).as("n_subjects"))
        .select(col("sub_id"), col("n_msgs"),
          (col("n_matches") - col("n_msgs")).as("n_dup_suppressed"),
          col("n_subjects"))
        .orderBy("sub_id")
    },
    Some("WITH " + fanoutSubjSql + """,
            subs(sub_id, fq, is_sub, base) AS (VALUES
              ('sub_overlap', 'UPDATES.STORAGE._.p2.>', true, 'UPDATES.STORAGE._.p2.'),
              ('sub_overlap', 'UPDATES.STORAGE._.p2._.c7._', false, NULL),
              ('sub_two_projects', 'UPDATES.STORAGE._.p0._', false, NULL),
              ('sub_two_projects', 'UPDATES.STORAGE._.p1._', false, NULL),
              ('sub_three', 'UPDATES.STORAGE._.p3._.c3._', false, NULL),
              ('sub_three', 'UPDATES.STORAGE._.p3._.c8._', false, NULL),
              ('sub_three', 'UPDATES.STORAGE._.p4.>', true, 'UPDATES.STORAGE._.p4.')),
            m AS (
              SELECT s.sub_id, j.event_id, j.subject
              FROM subj j JOIN subs s
                ON (s.is_sub AND starts_with(j.subject, s.base))
                OR (NOT s.is_sub AND j.subject = s.fq))
            SELECT sub_id,
                   CAST(count(DISTINCT CAST(event_id AS VARCHAR) || '|' || subject) AS BIGINT) AS n_msgs,
                   CAST(count(*) - count(DISTINCT CAST(event_id AS VARCHAR) || '|' || subject) AS BIGINT) AS n_dup_suppressed,
                   CAST(count(DISTINCT subject) AS BIGINT) AS n_subjects
            FROM m GROUP BY 1 ORDER BY sub_id"""))

  override val defs: Seq[QueryDef] = Seq(
    q32_window_tumbling, q33_window_sliding, q34_window_session,
    q35_dedup_keepfirst, q36_subject_fanout, q67_funnel, q69_eventtype_gate,
    q78_scd_intervals, q80_retention, q149_wildcard_match,
    q150_watermark_replay, q151_stateful_ledger_replay, q152_ssjoin_replay,
    q204_subject_union)
}
