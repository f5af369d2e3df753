package graft.tools

import org.apache.spark.sql.SparkSession

/** Replay-throughput probe: runs the bench's streaming replay N times
  * under the current SPARK_GRAFT_REPLAY_* env knobs and prints each
  * sample — for tuning batch size / source partitions without paying a
  * full bench pass. Usage:
  *   SPARK_GRAFT_REPLAY_BATCH=50000 SPARK_GRAFT_REPLAY_PARTS=16 \
  *     sbt "runMain graft.tools.ReplayProbe /root/testdata/sf0.1 3"
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wire = args.length > 2 && args(2) == "wire"
    (1 to n).foreach { i =>
      System.gc()
      val sec = if (wire) graft.Bench.wireReplaySeconds(spark, sfDir)
                else graft.Bench.streamReplaySeconds(spark, sfDir)
      println(f"[replay-probe] run $i: $sec%.2f s")
    }
    spark.stop()
  }
}
