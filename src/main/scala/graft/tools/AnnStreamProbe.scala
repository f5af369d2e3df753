package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.AnnIndexStream

/** Per-micro-batch cost of the LIVE streaming ANN-index maintenance
  * (round-9 verdict task 4's measurement half — the [[SaStreamProbe]]
  * treatment applied to [[AnnIndexStream]]): feeds the fixture's
  * embeddings through the sink in md5-arrival order, one batch per
  * leading arrival nibble, and times each fold — signature append,
  * candidate-pair join and parquet publish included. Shape-boundary
  * batches (where [[graft.operators.VectorOps.lshShape]] widens and the
  * pair set rebuilds) are flagged in the output, since their amortized
  * cost is the honest part of the incremental story. The final line
  * times the from-scratch rebuild (one sink of the whole corpus into a
  * fresh maintainer) for the vs-rebuild comparison.
  *
  * Usage: sbt "runMain graft.tools.AnnStreamProbe <sfDir> [nBatches]"
  */
object AnnStreamProbe {
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

    val root = java.nio.file.Files.createTempDirectory("graft-ann-stream-probe").toString
    val maintainer = new AnnIndexStream(spark, s"$root/live")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string")).as("m"))
      .localCheckpoint(true)
    var shape = (0, 0)
    (0 until nBatches).foreach { b =>
      val lo = b.toDouble / nBatches
      val hi = (b + 1).toDouble / nBatches
      val bucket = (conv(substring(col("m"), 1, 2), 16, 10).cast("int") / 256.0)
      val batch = emb.filter(bucket >= lo && bucket < hi)
        .select(col("vec_id"), col("embedding"))
      System.gc()
      val t0 = System.nanoTime()
      maintainer.sink(batch, b.toLong)
      val dt = (System.nanoTime() - t0) / 1e9
      val n = batch.count()
      val (bits, nt, covered) = maintainer.currentMeta
      val boundary = if ((bits, nt) != shape) s"  SHAPE→(bits=$bits,nt=$nt)" else ""
      shape = (bits, nt)
      println(f"[ann-stream] batch=$b%-3d vecs=$n%-6d covered=$covered%-7d append=$dt%.2fs$boundary")
    }
    val livePairs = maintainer.currentPairs.count()

    // vs-rebuild: the whole corpus folded as ONE batch into a fresh root
    System.gc()
    val rb = new AnnIndexStream(spark, s"$root/rebuild")
    val t0 = System.nanoTime()
    rb.sink(emb.select(col("vec_id"), col("embedding")), 0L)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[ann-stream] rebuild=$dt%.2fs pairs_live=$livePairs pairs_rebuild=${rb.currentPairs.count()}")
    spark.stop()
  }
}
