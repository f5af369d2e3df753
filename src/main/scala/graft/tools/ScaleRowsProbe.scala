package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs the bench's non-query rows (replay / redelivery soak / live
  * folds) against an arbitrary fixture dir — the 100× evidence runs
  * round-11 verdict tasks 3 and 5 ask for, without paying a full
  * bench suite at that scale. Each row is the SAME code path as the
  * `graft.Bench` row of that name; this just parameterizes the dir.
  *
  * Usage: sbt "runMain graft.tools.ScaleRowsProbe <sfDir> <row1,row2,...>"
  *   rows: stream | redelivery | sketch | ann | cc
  */
object ScaleRowsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf10b")
    val rows = args.lift(1).getOrElse("redelivery").split(',').map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    rows.foreach { row =>
      System.gc()
      val sec = row match {
        case "stream" => graft.Bench.streamReplaySeconds(spark, sfDir)
        case "redelivery" => graft.Bench.redeliveryReplaySeconds(spark, sfDir)
        case "sketch" => graft.Bench.sketchFoldSeconds(spark, sfDir)
        case "ann" => graft.Bench.annFoldSeconds(spark, sfDir)
        case "cc" => graft.Bench.ccFoldSeconds(spark, sfDir)
        case other => sys.error(s"unknown row: $other")
      }
      println(f"[scale-row] $row%-12s $sec%.2f s  ($sfDir)")
    }
    spark.stop()
  }
}
