package graft.tools

import org.apache.spark.sql.SparkSession

/** Fills the 300× tail-matrix cell the round-12 matrix excluded by
  * hand (q158's N² tile shuffle > single-node scratch): runs
  * [[graft.operators.VectorOps.similarityJoin]] against a fixture and
  * reports either the run time or the engine's MEASURED DECLINE (the
  * scratch estimate vs free space that round-13 task 4 added) —
  * so the cell is an engine decision with numbers, not a comment.
  *
  * Usage: runMain graft.tools.DenseEnvelopeProbe <sfDir> [threshold]
  */
object DenseEnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf30")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.45)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    try {
      val n = graft.operators.VectorOps.similarityJoin(spark, sfDir, threshold).count()
      println(f"[dense-envelope] RAN: pairs=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s ($sfDir, t=$threshold)")
    } catch {
      case e: IllegalArgumentException =>
        println(s"[dense-envelope] DECLINED ($sfDir, t=$threshold): ${e.getMessage}")
    }
    spark.stop()
  }
}
