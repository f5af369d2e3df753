package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Occupancy diagnostics for the adaptive LSH funnel: per-table bucket
  * histogram and the exact raw candidate volume Σ occ·(occ−1)/2 — the
  * number the q47/q62 candidate join actually enumerates. Written for
  * the round-8 100× rehearsal, where the projected-uniform estimate
  * (N/2^bits per bucket) and the real distribution disagreed enough to
  * out-spill a disk: sign-hyperplane buckets on structured data are
  * NOT uniform, and capacity planning must use the measured skew.
  *
  * Usage: sbt "runMain graft.tools.BucketProbe <sfDir>"
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val occ = graft.operators.VectorOps.bucketsFor(spark, sfDir)
      .groupBy("tk", "bk").agg(count(lit(1)).as("occ"))
    occ.cache()
    val pairs = occ.agg(sum(expr("occ * (occ - 1) / 2")).as("raw_pairs")).head.getDouble(0)
    println(f"[bucket-probe] raw candidate volume: $pairs%.3e")
    println("[bucket-probe] top-10 buckets by occupancy:")
    occ.orderBy(col("occ").desc).limit(10).collect()
      .foreach(r => println(s"[bucket-probe]   tk=${r.get(0)} bk=${r.get(1)} occ=${r.get(2)}"))
    println("[bucket-probe] occupancy deciles per table:")
    occ.groupBy("tk").agg(count(lit(1)).as("n_buckets"),
        max("occ").as("max_occ"), expr("percentile(occ, 0.5)").as("med_occ"),
        expr("percentile(occ, 0.99)").as("p99_occ"))
      .orderBy("tk").collect()
      .foreach(r => println(s"[bucket-probe]   ${r.mkString(" ")}"))
    spark.stop()
  }
}
