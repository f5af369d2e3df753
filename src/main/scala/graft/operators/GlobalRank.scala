package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale GLOBAL ranking without a corpus-scale single-partition
  * window — the device behind the suffix-array construction (q186).
  *
  * An unpartitioned `dense_rank()/row_number()` plans as ONE task
  * sorting the whole corpus (the shape the round-7 WindowExec audit
  * eliminated everywhere else). Instead:
  *
  *  1. `repartitionByRange(keys)` — Spark's RangePartitioner puts every
  *     row with EQUAL keys in one partition and orders partitions by
  *     key range (equal keys are never split: partition choice is a
  *     binary search on the key against sampled bounds);
  *  2. a window PARTITIONED by the range-partition id ranks locally —
  *     every partition sorts in parallel;
  *  3. composition across partitions:
  *     - [[orderRank]]: rank' = pid·2⁴⁰ + local dense_rank. The values
  *       are partitioning-DEPENDENT but ORDER- and EQUALITY-faithful —
  *       exactly what prefix-doubling iterations consume. Zero driver
  *       jobs, so an iterative algorithm pays nothing extra per round.
  *     - [[rowNumber]]: exact contiguous 1..N numbering via one
  *       collect of the per-partition COUNTS (bounded by the partition
  *       count), broadcast back as exclusive-prefix offsets. Values are
  *       partitioning-INDEPENDENT (canonical), so they can cross an
  *       engine boundary (the oracle mirrors them with its own
  *       row_number).
  *
  * The partition count is CORPUS-DERIVED, not a conf (the lshShape /
  * cellCount contract applied to the last hand dial — round-8 verdict
  * task 2): `max(spark.sql.shuffle.partitions,
  * ceil(rows / 2²¹))`, capped at 20 000. At gate scale the conf floor
  * wins (32 — plans and hashes unchanged); at the 100× rehearsal the
  * ~6×10⁸-row merge derives ~300 partitions, the scale that previously
  * OOM'd a 64 GB heap until the conf was hand-raised to 128
  * (BASELINE.md round-8). Both rank variants are value-stable under
  * partitioning (orderRank order-faithful by construction, rowNumber
  * canonical), so the derived count can never move a gate hash.
  * Callers that already know the input cardinality pass `rows`
  * (suffix-array rounds all rank the same N rows — one count, six
  * rounds); otherwise the input is pinned with an eager checkpoint and
  * counted once on the materialized blocks.
  *
  * AQE partition coalescing merges only ADJACENT range partitions, so
  * both the local order and the pid monotonicity survive it. */
private[graft] object GlobalRank {
  /** Target rows per range partition for the derived count: 2²¹ rows
    * of (doc, pos, rank)-sized state ≈ low hundreds of MB per task —
    * sized so a 32-thread local executor never holds more than a few
    * GB of in-flight sort state, and a 1000-executor cluster gets
    * enough tasks to spread the sort. */
  val TargetRowsPerPartition: Long = 1L << 21

  /** Pure derivation — pinned by GlobalRankSpec. */
  private[graft] def derivedParts(confParts: Int, rows: Long): Int = {
    val fromRows = (rows + TargetRowsPerPartition - 1) / TargetRowsPerPartition
    math.max(confParts, math.min(fromRows, 20000L).toInt)
  }

  private def parts(s: SparkSession, rows: Long): Int =
    derivedParts(s.conf.get("spark.sql.shuffle.partitions", "32").toInt, rows)

  /** Order/equality-faithful (non-canonical) global dense rank.
    * `rows` = input cardinality if the caller knows it (avoids a count
    * job per call in iterative algorithms); -1 derives from a count on
    * an eagerly checkpointed input. */
  def orderRank(df: DataFrame, keys: Seq[Column], out: String,
                rows: Long = -1L): DataFrame = {
    val (input, n) =
      if (rows >= 0L) (df, rows)
      else { val c = Ckpt.ser(df); (c, c.count()) }
    val ranged = input.repartitionByRange(parts(df.sparkSession, n), keys: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    ranged
      .withColumn(out, col("__pid").cast("long") * lit(1L << 40) + dense_rank().over(w))
      .drop("__pid")
  }

  /** Exact contiguous global row number 1..N over `keys` order. */
  def rowNumber(df: DataFrame, keys: Seq[Column], out: String,
                rows: Long = -1L): DataFrame = {
    val (input, n) =
      if (rows >= 0L) (df, rows)
      else { val c = Ckpt.ser(df); (c, c.count()) }
    val ranged = input.repartitionByRange(parts(df.sparkSession, n), keys: _*)
      .withColumn("__pid", spark_partition_id())
      .transform(Ckpt.ser(_)) // pin partition identity: the count job and
    // the ranking must see the SAME range partitioning (a re-executed
    // non-deterministic sample could legally re-draw bounds)
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offDf = broadcast(ranged.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    ranged.withColumn("__rn", row_number().over(w))
      .join(offDf, "__pid")
      .withColumn(out, col("__off") + col("__rn"))
      .drop("__pid", "__off", "__rn")
  }

  /** Exact global RUNNING SUM of `value` over `keys` order (inclusive)
    * — [[rowNumber]]'s device with sums instead of counts: range
    * partition on the keys, per-partition window prefix sums, and a
    * broadcast exclusive per-partition total table stitches them into
    * the global cumulative — parallel local work at any size, driver
    * state ≤ partition count. The distributed form of the cumulative
    * scan every quantile/CDF read needs. */
  def runningSum(df: DataFrame, keys: Seq[Column], value: Column, out: String,
                 rows: Long = -1L): DataFrame = {
    val (input, n) =
      if (rows >= 0L) (df, rows)
      else { val c = Ckpt.ser(df); (c, c.count()) }
    val ranged = input.repartitionByRange(parts(df.sparkSession, n), keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .transform(Ckpt.ser(_)) // pin partition identity (rowNumber's rule)
    val totals = ranged.groupBy("__pid").agg(sum("__v").as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offDf = broadcast(ranged.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__run", sum(col("__v")).over(w))
      .join(offDf, "__pid")
      .withColumn(out, col("__off") + col("__run"))
      .drop("__pid", "__off", "__run", "__v")
  }
}
