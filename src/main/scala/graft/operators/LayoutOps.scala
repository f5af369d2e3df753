package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Data-LAYOUT operators: the write-side lever that turns min/max file
  * statistics into multi-column skipping at 100 TB.
  *
  * A single sort column gives perfect pruning on that column and none
  * on any other; interleaving the bits of two columns (the Z-order /
  * Morton curve — the public technique behind Delta's OPTIMIZE ZORDER
  * and an Iceberg sort-order option) gives BOTH columns locality: any
  * run of consecutive z values covers a bounded rectangle in (x, y), so
  * every row group of a z-sorted file carries tight min/max ranges on
  * both columns and a predicate on either (or both) skips most groups.
  *
  * q179 derives the curve itself as data — oracle-checked bit
  * arithmetic — and reports the per-bucket bounding rectangles that
  * make the locality claim inspectable. `LayoutSpec` completes the
  * story END-TO-END: it writes the same rows z-sorted vs
  * insertion-ordered with small parquet row groups and measures the
  * actual per-row-group min/max coverage from the footers — the
  * measured skipping advantage, not the textbook one.
  */
object LayoutOps extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** 8-bit × 8-bit Morton interleave of two bounded ints as a Column:
    * bit k of x lands at position 2k, bit k of y at 2k+1. */
  def morton8(x: Column, y: Column): Column =
    (0 until 8).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }.reduce(_ + _)

  /** The same interleave as SQL text (for the oracle). */
  def morton8Sql(x: String, y: String): String =
    (0 until 8).map { k =>
      s"((($x >> $k) & 1) << ${2 * k}) + ((($y >> $k) & 1) << ${2 * k + 1})"
    }.mkString(" + ")

  /** Z-ORDER LAYOUT PROFILE: map events onto an 8-bit × 8-bit Morton
    * curve over (user_id, ⌊value⌋) and report, per 1024-wide z bucket
    * (= one 32×32 tile of the (x,y) plane), the row count and the exact
    * bounding rectangle. The output IS the layout argument: every
    * bucket's rectangle is provably ≤ 32×32 regardless of data skew, so
    * a file written per bucket (or a row group covering ~one bucket)
    * prunes on either column independently. Bit-exact in both engines —
    * integer shifts and masks only.
    *
    * Scale: one linear projection + one aggregation on the bucket key
    * (bounded keyspace: 64 buckets at 8+8 bits). The WRITE-side use is
    * `repartitionByRange(col("z"))` + `sortWithinPartitions("z")` —
    * measured in LayoutSpec; this query is the skew-aware planning view
    * a pipeline inspects before committing a layout. */
  val q179_zorder_layout = QueryDef(
    "q179_zorder_layout",
    (s, dir) => {
      val x = col("user_id").bitwiseAND(lit(255L))
      val y = floor(col("value")).cast("long").bitwiseAND(lit(255L))
      t(s, dir, "events")
        .select(x.as("x"), y.as("y"))
        .withColumn("z", morton8(col("x"), col("y")))
        .withColumn("zbucket", expr("z div 1024"))
        .groupBy("zbucket")
        .agg(count(lit(1)).cast("long").as("n_events"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"),
          min("z").as("z_min"), max("z").as("z_max"))
        .orderBy("zbucket")
    },
    Some(s"""WITH pts AS (
              SELECT (user_id & 255) AS x,
                     (CAST(floor(value) AS BIGINT) & 255) AS y
              FROM events),
            zs AS (
              SELECT x, y, ${morton8Sql("x", "y")} AS z FROM pts)
            SELECT z // 1024 AS zbucket,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(x) AS x_min, max(x) AS x_max,
                   min(y) AS y_min, max(y) AS y_max,
                   min(z) AS z_min, max(z) AS z_max
            FROM zs GROUP BY 1 ORDER BY zbucket"""))

  /** Z-ORDER PRUNING EVALUATION — the layout measured on data, the way
    * q153/q157/q159 measure the ANN/LSH indexes: for a concrete 2-D
    * predicate box, how many z buckets (≙ files or row groups at scale)
    * must a min/max-pruning reader open, how many rows does it read,
    * and how many actually match? `read_amp_fp` (rows read per matching
    * row, fixed-point ×10⁶) is the number a pipeline owner checks
    * before committing a layout — a full scan's read amplification is
    * total/matching; the z layout's should sit near 1. The box is
    * deliberately NOT tile-aligned (tiles are 32×32; a tile-aligned box
    * measures exactly 1.0 by construction), so the reported
    * amplification includes the partial-edge-tile cost a real predicate
    * pays.
    *
    * The bucket stats are the q179 aggregate (bounded: ≤64 rows); the
    * box overlap test runs against those 64 rows, and the exact match
    * count is one more linear scan. No join touches corpus² anything. */
  val q180_zorder_prune_eval = QueryDef(
    "q180_zorder_prune_eval",
    (s, dir) => {
      val (bx0, bx1, by0, by1) = (40L, 100L, 70L, 150L)
      val x = col("user_id").bitwiseAND(lit(255L))
      val y = floor(col("value")).cast("long").bitwiseAND(lit(255L))
      val pts = t(s, dir, "events")
        .select(x.as("x"), y.as("y"))
        .withColumn("z", morton8(col("x"), col("y")))
      val buckets = pts
        .groupBy(expr("z div 1024").as("zbucket"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
      val read = buckets.agg(
        count(lit(1)).cast("long").as("n_buckets_total"),
        sum(when(col("x_min") <= bx1 && col("x_max") >= bx0
          && col("y_min") <= by1 && col("y_max") >= by0, 1L).otherwise(0L))
          .cast("long").as("n_buckets_read"),
        sum(when(col("x_min") <= bx1 && col("x_max") >= bx0
          && col("y_min") <= by1 && col("y_max") >= by0, col("n_events")).otherwise(0L))
          .cast("long").as("rows_read"),
        sum(col("n_events")).cast("long").as("rows_total"))
      val matched = pts.filter(col("x").between(bx0, bx1) && col("y").between(by0, by1))
        .agg(count(lit(1)).cast("long").as("rows_match"))
      // nullif-guarded divisor (round 14): a fixture whose box matches
      // ZERO rows (sf0.001) made BOTH engines raise on the integer
      // division — an untotal eval. NULL amplification for an empty
      // match is the honest answer; at every scale with matches the
      // values (and hashes) are unchanged.
      read.crossJoin(matched)
        .withColumn("read_amp_fp", expr("rows_read * 1000000 div nullif(rows_match, 0)"))
        .withColumn("scan_amp_fp", expr("rows_total * 1000000 div nullif(rows_match, 0)"))
        .select("n_buckets_total", "n_buckets_read", "rows_total", "rows_read",
          "rows_match", "read_amp_fp", "scan_amp_fp")
    },
    Some(s"""WITH pts AS (
              SELECT (user_id & 255) AS x,
                     (CAST(floor(value) AS BIGINT) & 255) AS y
              FROM events),
            zs AS (
              SELECT x, y, ${morton8Sql("x", "y")} AS z FROM pts),
            buckets AS (
              SELECT z // 1024 AS zbucket,
                     CAST(count(*) AS BIGINT) AS n_events,
                     min(x) AS x_min, max(x) AS x_max,
                     min(y) AS y_min, max(y) AS y_max
              FROM zs GROUP BY 1),
            read AS (
              SELECT CAST(count(*) AS BIGINT) AS n_buckets_total,
                     CAST(sum(CASE WHEN x_min <= 100 AND x_max >= 40
                                    AND y_min <= 150 AND y_max >= 70
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_read,
                     CAST(sum(CASE WHEN x_min <= 100 AND x_max >= 40
                                    AND y_min <= 150 AND y_max >= 70
                                   THEN n_events ELSE 0 END) AS BIGINT) AS rows_read,
                     CAST(sum(n_events) AS BIGINT) AS rows_total
              FROM buckets),
            matched AS (
              SELECT CAST(count(*) AS BIGINT) AS rows_match FROM pts
              WHERE x BETWEEN 40 AND 100 AND y BETWEEN 70 AND 150)
            SELECT n_buckets_total, n_buckets_read, rows_total, rows_read,
                   rows_match,
                   rows_read * 1000000 // nullif(rows_match, 0) AS read_amp_fp,
                   rows_total * 1000000 // nullif(rows_match, 0) AS scan_amp_fp
            FROM read, matched"""))

  /** SMALL-FILE COMPACTION PLAN — the OTHER half of lakehouse table
    * maintenance next to q179's z-order: streaming ingest writes one
    * file per (partition, micro-batch, task), and a year of 250 ms
    * triggers leaves millions of KB-sized files whose open/footer cost
    * dominates scans long before row count does. The public fix (Delta
    * OPTIMIZE bin-packing, Iceberg rewrite_data_files) plans, per table
    * partition, which small files coalesce into which target-sized
    * output ("bin"), then rewrites each bin as one file.
    *
    * The file inventory is derived deterministically from data: one
    * "file" per (event_date, user_id % 64) — exactly the layout a
    * by-user-bucketed streaming sink produces — with logical size
    * Σ length(props). The plan orders each partition's files largest
    * first and assigns bin = ⌊cumulative-bytes-before / target⌋: the
    * distributed form of greedy bin-packing. Packing bound (both halves
    * asserted by CompactionSpec): every bin closes BELOW target + its
    * own largest member, and every NON-FINAL bin per partition closes
    * ABOVE target − the partition's largest member (the final bin holds
    * the remainder and may be arbitrarily small). First-fit-decreasing's
    * sequential free-list cannot run on a cluster, and this bound is
    * what Delta's own OPTIMIZE settles for. Output = the task list a
    * rewrite job executes, one row per bin with its size and file span.
    *
    * Scale: planning is one linear aggregation (file inventory) plus a
    * window over ≤64 rows per date partition — BOUNDED per partition by
    * the bucket count, never corpus-growing, and partitions plan in
    * parallel (the per-partition independence is why OPTIMIZE
    * parallelizes). `CompactionSpec` executes a plan against real
    * parquet: post-compaction file count == bin count, rows preserved. */
  val q190_compaction_binpack = QueryDef(
    "q190_compaction_binpack",
    (s, dir) => {
      val target = 1024L
      val files = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("event_date"),
          expr("user_id % 64").as("file_id"))
        .agg(sum(length(col("props"))).cast("long").as("bytes"),
          count(lit(1)).cast("long").as("n_rows"))
      val w = Window.partitionBy("event_date")
        .orderBy(col("bytes").desc, col("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before", coalesce(sum("bytes").over(w), lit(0L)))
        .withColumn("bin", expr(s"cum_before div $target"))
        .groupBy("event_date", "bin")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum("bytes").cast("long").as("bin_bytes"),
          max("bytes").cast("long").as("max_file_bytes"),
          sum("n_rows").cast("long").as("n_rows"),
          min("file_id").cast("long").as("file_id_min"),
          max("file_id").cast("long").as("file_id_max"))
        .orderBy("event_date", "bin")
    },
    Some("""WITH files AS (
              SELECT CAST(ts AS DATE) AS event_date,
                     user_id % 64 AS file_id,
                     CAST(sum(length(props)) AS BIGINT) AS bytes,
                     CAST(count(*) AS BIGINT) AS n_rows
              FROM events GROUP BY 1, 2),
            planned AS (
              SELECT event_date, file_id, bytes, n_rows,
                     CAST(coalesce(sum(bytes) OVER (PARTITION BY event_date
                       ORDER BY bytes DESC, file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       // 1024 AS BIGINT) AS bin
              FROM files)
            SELECT event_date, bin,
                   CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(bytes) AS BIGINT) AS bin_bytes,
                   CAST(max(bytes) AS BIGINT) AS max_file_bytes,
                   CAST(sum(n_rows) AS BIGINT) AS n_rows,
                   CAST(min(file_id) AS BIGINT) AS file_id_min,
                   CAST(max(file_id) AS BIGINT) AS file_id_max
            FROM planned GROUP BY event_date, bin
            ORDER BY event_date, bin"""))

  override val defs: Seq[QueryDef] =
    Seq(q179_zorder_layout, q180_zorder_prune_eval, q190_compaction_binpack)
}
