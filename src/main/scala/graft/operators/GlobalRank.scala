package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *       collect of the ≤`shuffle.partitions` per-partition COUNTS,
  *       broadcast back as exclusive-prefix offsets. Values are
  *       partitioning-INDEPENDENT (canonical), so they can cross an
  *       engine boundary (the oracle mirrors them with its own
  *       row_number).
  *
  * AQE partition coalescing merges only ADJACENT range partitions, so
  * both the local order and the pid monotonicity survive it. */
private[graft] object GlobalRank {
  /** Order/equality-faithful (non-canonical) global dense rank. */
  def orderRank(df: DataFrame, keys: Seq[Column], out: String): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    ranged
      .withColumn(out, col("__pid").cast("long") * lit(1L << 40) + dense_rank().over(w))
      .drop("__pid")
  }

  /** Exact contiguous global row number 1..N over `keys` order. */
  def rowNumber(df: DataFrame, keys: Seq[Column], out: String): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin partition identity: the count job and
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
}
