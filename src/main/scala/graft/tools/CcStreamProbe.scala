package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures [[graft.streaming.CcStream]]'s fold-vs-rebuild gap — the
  * AnnStreamProbe treatment for live component labels. The fixture dup
  * graphs are tiny after the df=2 reduction, so the probe builds a
  * DENSE deterministic random graph (default 2M edges over 100k nodes,
  * ~20 edges/node — the regime where "fold cost ∝ labeled nodes +
  * batch, NEVER cumulative edges" actually separates from the rebuild,
  * whose every star-contraction round re-shuffles the full edge set).
  * Edges arrive in `batches` id-order slices; each fold is timed; a
  * from-scratch `connectedComponents` over the cumulative edges is
  * timed at quarter points; the final live labels are asserted equal
  * to the final rebuild.
  *
  * Usage:
  *   sbt "runMain graft.tools.CcStreamProbe [nEdges] [nNodes] [batches]"
  */
object CcStreamProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 2000000L
    val nNodes = if (args.length > 1) args(1).toLong else 100000L
    val batches = if (args.length > 2) args(2).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic dense multigraph: endpoints from two hash streams
    def edges(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("a"),
        pmod(xxhash64(col("id"), lit(2)), lit(nNodes)).as("b"))
      .filter(col("a") =!= col("b"))

    val root = java.nio.file.Files.createTempDirectory("graft-cc-probe").toString
    val m = new graft.streaming.CcStream(spark, root)
    val per = nEdges / batches
    (0 until batches).foreach { i =>
      val b = edges(i * per, (i + 1) * per)
      System.gc()
      val t0 = System.nanoTime()
      m.sink(b.toDF(), i.toLong)
      val dt = (System.nanoTime() - t0) / 1e9
      val rebuilt = if ((i + 1) % math.max(batches / 4, 1) == 0) {
        System.gc()
        val r0 = System.nanoTime()
        val n = graft.operators.GraphOps
          .connectedComponents(edges(0, (i + 1) * per)).count()
        f" rebuild=${(System.nanoTime() - r0) / 1e9}%.2fs ($n labels)"
      } else ""
      println(f"[cc-probe] batch $i%2d fold=$dt%.2fs$rebuilt")
    }
    // live ≡ rebuild, in full
    val live = m.currentLabels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val full = graft.operators.GraphOps.connectedComponents(edges(0, nEdges))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    require(live == full, s"live labels (${live.size}) != rebuild (${full.size})")
    println(s"[cc-probe] OK: live == rebuild over ${live.size} labeled nodes")
    spark.stop()
  }
}
