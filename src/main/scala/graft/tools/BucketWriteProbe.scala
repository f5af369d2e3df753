package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposes the bucketed delivery write's per-batch floor (round-13
  * task 1 follow-through): at G=2000/sf0.1 the batch median landed at
  * ~1.6 s of which ~1.2 s is the write phase — for ~30k rows in 32
  * files, i.e. fixed overhead, not data. This probe times the write
  * variants on a realistic synthetic batch so the chosen layout is the
  * measured-fastest, not the first-correct:
  *
  *   a) current: persist → dynamic-partition-overwrite under the table
  *      root → count over the cached frame
  *   b) no persist: write, then count by reading the just-written batch
  *      dir back (one small disk-local job)
  *   c) batch-dir overwrite: plain mode=overwrite scoped to
  *      `batches/batch=<seq>` (no dynamic staging across the root),
  *      partitionBy(bucket) only
  *   d) c + no sortWithinPartitions (is the sort visible at all?)
  *
  * Usage: runMain graft.tools.BucketWriteProbe [rows] [groups] [reps]
  */
object BucketWriteProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(30000)
    val groups = args.lift(1).map(_.toInt).getOrElse(1500)
    val reps = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    def batch(seq: Long): DataFrame =
      spark.range(0L, rows.toLong, 1L, 8)
        .select(
          concat(lit("g"), (col("id") % groups).cast("string")).as("groupId"),
          concat(lit("g"), (col("id") % groups).cast("string"), lit(s"-$seq")).as("chunkId"),
          concat(lit("UPDATES.STORAGE._.p"), (col("id") % 5).cast("string"), lit("._")).as("subject"),
          concat(lit("r"), col("id").cast("string")).as("resourceId"))

    def timed(name: String)(f: Long => Unit): Unit = {
      val times = (0 until reps).map { i =>
        System.gc()
        val t0 = System.nanoTime()
        f(i.toLong)
        (System.nanoTime() - t0) / 1e9
      }
      val warm = times.drop(1).sorted
      println(f"$name%-28s med(warm)=${warm(warm.size / 2)}%.2fs  all=${times.map(t => f"$t%.2f").mkString(" ")}")
    }

    val dirA = java.nio.file.Files.createTempDirectory("bwp-a-").toString
    timed("a_persist_dynamic") { seq =>
      val prepared = batch(seq).select(col("groupId"), col("chunkId"), col("subject"),
          col("resourceId"), monotonically_increasing_id().as("seq"),
          pmod(xxhash64(col("groupId")), lit(parts.toLong)).as("bucket"))
        .withColumn("batch", lit(seq))
        .repartition(parts, col("bucket"))
        .sortWithinPartitions("batch", "bucket", "groupId", "seq")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prepared.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "bucket").parquet(dirA)
      prepared.groupBy("groupId").count().collect()
      prepared.unpersist()
    }

    val dirB = java.nio.file.Files.createTempDirectory("bwp-b-").toString
    timed("b_nopersist_readback") { seq =>
      batch(seq).select(col("groupId"), col("chunkId"), col("subject"),
          col("resourceId"), monotonically_increasing_id().as("seq"),
          pmod(xxhash64(col("groupId")), lit(parts.toLong)).as("bucket"))
        .withColumn("batch", lit(seq))
        .repartition(parts, col("bucket"))
        .sortWithinPartitions("batch", "bucket", "groupId", "seq")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "bucket").parquet(dirB)
      spark.read.parquet(s"$dirB/batch=$seq")
        .groupBy("groupId").count().collect()
    }

    val dirC = java.nio.file.Files.createTempDirectory("bwp-c-").toString
    timed("c_batchdir_overwrite") { seq =>
      val prepared = batch(seq).select(col("groupId"), col("chunkId"), col("subject"),
          col("resourceId"), monotonically_increasing_id().as("seq"),
          pmod(xxhash64(col("groupId")), lit(parts.toLong)).as("bucket"))
        .repartition(parts, col("bucket"))
        .sortWithinPartitions("bucket", "groupId", "seq")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prepared.write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$dirC/batch=$seq")
      prepared.groupBy("groupId").count().collect()
      prepared.unpersist()
    }

    val dirD = java.nio.file.Files.createTempDirectory("bwp-d-").toString
    timed("d_c_nosort") { seq =>
      val prepared = batch(seq).select(col("groupId"), col("chunkId"), col("subject"),
          col("resourceId"), monotonically_increasing_id().as("seq"),
          pmod(xxhash64(col("groupId")), lit(parts.toLong)).as("bucket"))
        .repartition(parts, col("bucket"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prepared.write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$dirD/batch=$seq")
      prepared.groupBy("groupId").count().collect()
      prepared.unpersist()
    }

    val dirE = java.nio.file.Files.createTempDirectory("bwp-e-").toString
    timed("e_batchdir_readback") { seq =>
      batch(seq).select(col("groupId"), col("chunkId"), col("subject"),
          col("resourceId"), monotonically_increasing_id().as("seq"),
          pmod(xxhash64(col("groupId")), lit(parts.toLong)).as("bucket"))
        .repartition(parts, col("bucket"))
        .sortWithinPartitions("bucket", "groupId", "seq")
        .write.mode("overwrite")
        .partitionBy("bucket").parquet(s"$dirE/batch=$seq")
      spark.read.parquet(s"$dirE/batch=$seq")
        .groupBy("groupId").count().collect()
    }

    spark.stop()
  }
}
