package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-preparation operators that slice documents and embeddings into
  * the shapes a training pipeline feeds downstream: fixed-size chunking
  * with overlap (the RAG/context-window splitter), per-dimension
  * embedding statistics (the "is this embedding column healthy" check),
  * and regex span extraction.
  *
  * Scale shapes: chunking is a generator (one `posexplode` per document,
  * output ∝ corpus size — no shuffle at all until the caller aggregates);
  * dimension stats shuffle exactly 64 keys regardless of corpus size;
  * span extraction is a linear scan. All arithmetic that crosses the
  * engine boundary is integer fixed-point (QueryDef determinism rules).
  */
object CorpusOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** Fixed-size document chunking with overlap (chunk 200 chars, stride
    * 150 ⇒ 50-char overlap): the canonical pre-embedding splitter. The
    * chunk set is a pure per-row generator — `sequence` builds the
    * start offsets, `posexplode` emits them — so the operator is
    * embarrassingly parallel and produces no exchange; chunk identity
    * travels as md5 so downstream dedup can run on fixed-width keys
    * instead of raw text. */
  val q121_doc_chunk = QueryDef(
    "q121_doc_chunk",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"))
      d.select(col("doc_id"), col("text"),
          posexplode(sequence(lit(0), length(col("text")) - 1, lit(150))))
        .withColumnRenamed("pos", "chunk_idx")
        .withColumnRenamed("col", "off")
        .withColumn("chunk", expr("substring(text, off + 1, 200)"))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("off").cast("long").as("off"),
          length(col("chunk")).cast("long").as("chunk_len"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH starts AS (
              SELECT doc_id, text, unnest(range(0, length(text), 150)) AS i
              FROM documents WHERE length(text) > 0)
            SELECT doc_id, CAST(i // 150 AS BIGINT) AS chunk_idx,
                   CAST(i AS BIGINT) AS off,
                   CAST(length(substr(text, i + 1, 200)) AS BIGINT) AS chunk_len,
                   md5(substr(text, i + 1, 200)) AS chunk_md5
            FROM starts ORDER BY doc_id, chunk_idx"""))

  /** Per-dimension embedding statistics over the 64-dim column: count,
    * fixed-point sum/min/max/mean of each coordinate. The shuffle key
    * space is exactly the dimensionality (64 keys at any corpus size),
    * so the aggregation is a map-side partial combine into a constant
    * number of reducers. float→double is exact per element and
    * `floor(v·10⁶)` is rounding-mode-free, so the BIGINT moments are
    * bit-identical across engines. */
  val q122_embed_dimstats = QueryDef(
    "q122_embed_dimstats",
    (s, dir) => {
      t(s, dir, "embeddings")
        .select(posexplode(col("embedding")))
        .select(col("pos").cast("long").as("dim"),
          floor(col("col").cast("double") * lit(1e6)).cast("long").as("fp"))
        .groupBy("dim")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("fp").cast("long").as("sum_fp"),
          min("fp").as("min_fp"), max("fp").as("max_fp"))
        .withColumn("mean_fp", expr("sum_fp div n"))
        .orderBy("dim")
    },
    Some("""WITH ex AS (
              SELECT i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS fp
              FROM (SELECT embedding,
                           unnest(generate_series(1, len(embedding))) AS i
                    FROM embeddings)),
            agg AS (
              SELECT CAST(i - 1 AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(fp) AS BIGINT) AS sum_fp,
                     min(fp) AS min_fp, max(fp) AS max_fp
              FROM ex GROUP BY i)
            SELECT dim, n, sum_fp, min_fp, max_fp,
                   CAST(sum_fp // n AS BIGINT) AS mean_fp
            FROM agg ORDER BY dim"""))

  /** Regex span extraction (all matches, not just the first): count of
    * long alphabetic tokens per document plus the first such span — the
    * shape of PII/pattern scanners that tag rather than redact (q71 is
    * the redacting form). Pure linear scan, no shuffle; the pattern
    * stays in RE2-compatible syntax so broker-side and Spark-side
    * semantics agree. */
  val q126_regex_spans = QueryDef(
    "q126_regex_spans",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("CAST(size(regexp_extract_all(text, '[a-z]{7,}', 0)) AS BIGINT)").as("n_long"),
          coalesce(expr("regexp_extract(text, '([a-z]{7,})', 1)"), lit("")).as("first_long"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT) AS n_long,
                   COALESCE(regexp_extract(text, '([a-z]{7,})', 1), '') AS first_long
            FROM documents ORDER BY doc_id"""))

  /** Null-preserving explode (explode_outer / OUTER UNNEST): documents
    * with NO qualifying token stay in the output with a NULL token —
    * the generator form a curation report needs when "no matches" is
    * itself the signal. Also pins NULL-ordering parity: Spark sorts
    * NULLS FIRST on ASC by default, DuckDB NULLS LAST, so the total
    * order spells it out on both sides. */
  val q142_explode_outer = QueryDef(
    "q142_explode_outer",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(text, ' '), w -> length(w) >= 8)").as("ws"))
        .select(col("doc_id"), explode_outer(col("ws")).as("w"))
        .orderBy(col("doc_id"), col("w").asc_nulls_first)
    },
    Some("""WITH ws AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), w -> length(w) >= 8) AS l
              FROM documents)
            SELECT doc_id,
                   unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS w
            FROM ws ORDER BY doc_id, w NULLS FIRST"""))

  /** Heterogeneous-source activity feed: events and orders unioned BY
    * NAME with missing columns null-filled (`unionByName(…,
    * allowMissingColumns=true)` — the schema-drift-tolerant union a
    * multi-source ingest needs; positional UNION would silently pair
    * wrong columns). The oracle spells the missing column as an
    * explicit typed NULL, which is exactly the contract the Spark form
    * implements. */
  val q145_activity_feed = QueryDef(
    "q145_activity_feed",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(lit("event").as("kind"), col("event_id").as("src_id"),
          col("ts"), col("event_type").as("what"), col("value").as("amount"))
      val ord = t(s, dir, "orders")
        .select(lit("order").as("kind"), col("o_orderkey").as("src_id"),
          col("o_orderdate").as("ts"), col("o_orderpriority").as("what"))
      ev.unionByName(ord, allowMissingColumns = true)
        .orderBy("kind", "src_id")
    },
    Some("""SELECT 'event' AS kind, event_id AS src_id, ts,
                   event_type AS what, value AS amount
            FROM events
            UNION ALL
            SELECT 'order' AS kind, o_orderkey AS src_id, o_orderdate AS ts,
                   o_orderpriority AS what, CAST(NULL AS DOUBLE) AS amount
            FROM orders
            ORDER BY kind, src_id"""))

  /** Per-dimension QUANTILE NORMALIZATION of the embedding column (the
    * rank-based preprocessing that makes heterogeneous feature scales
    * comparable): each coordinate maps to its rank position within its
    * dimension, scaled to [0, 10⁶] in exact integers —
    * (rn−1)·10⁶ div (n−1). The window partitions by dimension (64
    * partitions at any corpus size) and the rank order is fully
    * tie-broken (value fp, then vec_id), so the normalized grid is
    * engine-identical. Output restricted to the probe vectors; the
    * ranking still runs over the full corpus per dimension. */
  val q146_quantile_norm = QueryDef(
    "q146_quantile_norm",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ex = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("dim"),
          floor(col("col").cast("double") * lit(1e6)).cast("long").as("fp"))
      val w = Window.partitionBy("dim").orderBy("fp", "vec_id")
      val n = Window.partitionBy("dim")
      ex.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(n))
        .filter(col("vec_id") < 64)
        .select(col("vec_id"), col("dim"),
          // rn is IntegerType: widen BEFORE the ×10⁶ or any dimension
          // partition past 2148 rows overflows 32-bit (ANSI throw /
          // silent wrap). NULLIF guards the n=1 degenerate partition.
          expr("(CAST(rn AS BIGINT) - 1) * 1000000 div NULLIF(CAST(n AS BIGINT) - 1, 0)")
            .as("qn_fp"))
        .orderBy("vec_id", "dim")
    },
    Some("""WITH ex AS (
              SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
                     CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS fp
              FROM (SELECT vec_id, embedding,
                           unnest(generate_series(1, len(embedding))) AS i
                    FROM embeddings)),
            ranked AS (
              SELECT vec_id, dim,
                     row_number() OVER (PARTITION BY dim ORDER BY fp, vec_id) AS rn,
                     count(*) OVER (PARTITION BY dim) AS n
              FROM ex)
            SELECT vec_id, dim,
                   CAST((rn - 1) * 1000000 // NULLIF(n - 1, 0) AS BIGINT) AS qn_fp
            FROM ranked WHERE vec_id < 64
            ORDER BY vec_id, dim"""))

  /** TOKEN-BUDGET CURVE: the planning query behind "which slice of the
    * corpus fills an N-token training budget" — docs greedily ordered
    * by quality (chars-per-token fixed point, ties by doc_id), then the
    * cumulative token count is bucketed into deciles of the total
    * budget: each row says how many docs and tokens the k-th
    * best-quality decile contributes. All integer arithmetic. The
    * ordered cumulative sum runs per quality stratum and merges via a
    * bounded prefix table — see the in-body comment. */
  val q155_token_budget = QueryDef(
    "q155_token_budget",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // DISTRIBUTED ordered cumsum (round-7 WindowExec audit): `score`
      // is fixed-point chars-per-token — a VALUE-bounded keyspace — so
      // the global (score desc, doc_id) running sum decomposes into an
      // intra-score windowed sum after one hash shuffle on score, plus
      // an exclusive prefix over the bounded per-score totals table
      // (broadcast back); `total` becomes a 1-row aggregate instead of
      // an unbounded single-partition window. Same values as the single
      // global sort (the oracle keeps that formulation), no
      // corpus-scale one-partition window — the q150/q74 device.
      val d = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tokens"),
          col("n_chars"))
        .withColumn("score", expr("n_chars * 1000 div tokens"))
      val wIn = Window.partitionBy("score").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPre = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, -1) // bounded: one row per score value
      val pre = d.groupBy("score").agg(sum("tokens").as("stok"))
        .withColumn("prior", coalesce(sum("stok").over(wPre), lit(0L)))
        .select("score", "prior")
      val total = d.agg(sum("tokens").as("total"))
      d.join(broadcast(pre), "score")
        .withColumn("cum", col("prior") + sum("tokens").over(wIn))
        .crossJoin(broadcast(total))
        .withColumn("decile", expr("(cum - 1) * 10 div total"))
        .groupBy("decile")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("tokens").cast("long").as("bucket_tokens"),
          max("cum").cast("long").as("cum_tokens"))
        .orderBy("decile")
    },
    Some("""WITH d AS (
              SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
                     n_chars * 1000 // len(string_split(text, ' ')) AS score
              FROM documents),
            c AS (
              SELECT doc_id, tokens,
                     sum(tokens) OVER (ORDER BY score DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     sum(tokens) OVER () AS total
              FROM d)
            SELECT CAST((cum - 1) * 10 // total AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tokens) AS BIGINT) AS bucket_tokens,
                   CAST(max(cum) AS BIGINT) AS cum_tokens
            FROM c GROUP BY 1 ORDER BY decile"""))

  def defs: Seq[QueryDef] = Seq(q121_doc_chunk, q122_embed_dimstats, q126_regex_spans,
    q142_explode_outer, q145_activity_feed, q146_quantile_norm, q155_token_budget)
}
