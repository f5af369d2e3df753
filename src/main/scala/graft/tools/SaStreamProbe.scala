package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.SaIndexStream

/** Per-micro-batch cost of the LIVE streaming SA maintenance (round-8
  * verdict task 7's measurement half): feeds the fixture's documents
  * through [[SaIndexStream.sink]] in md5-arrival order, one batch per
  * leading arrival nibble (the q194 split generalized to 16 batches),
  * and times each append — merge + parquet publish included, i.e. the
  * cost a foreachBatch micro-batch actually pays.
  *
  * Usage: sbt "runMain graft.tools.SaStreamProbe <sfDir> [nBatches]"
  */
object SaStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-sa-stream-probe").toString
    val maintainer = new SaIndexStream(spark, root)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        md5(col("doc_id").cast("string")).as("m"))
      .localCheckpoint(true)
    (0 until nBatches).foreach { b =>
      val lo = b.toDouble / nBatches
      val hi = (b + 1).toDouble / nBatches
      // arrival bucket from the first two md5 nibbles (256 buckets)
      val bucket = (conv(substring(col("m"), 1, 2), 16, 10).cast("int") / 256.0)
      val batch = docs.filter(bucket >= lo && bucket < hi)
        .select(col("doc_id"), col("text"))
      System.gc()
      val t0 = System.nanoTime()
      maintainer.sink(batch, b.toLong)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = batch.count()
      println(f"[sa-stream] batch=$b%-3d docs=$n%-6d append=$dt%.2fs")
    }
    val total = maintainer.currentSa.count()
    println(s"[sa-stream] final index rows=$total")
    spark.stop()
  }
}
