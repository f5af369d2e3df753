package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiles the wire-replay scale gap (round-8 verdict task 4): runs
  * [[graft.Bench.wireReplaySeconds]] standalone so the produce/drain
  * split and the producer-count scaling are measurable without the
  * full bench. `SPARK_GRAFT_WIRE_PRODUCERS` / `SPARK_GRAFT_REPLAY_*`
  * env knobs apply as in the bench.
  *
  * Usage: sbt "runMain graft.tools.WireReplayProbe <sfDir>"
  */
object WireReplayProbe {
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
    val secs = graft.Bench.wireReplaySeconds(spark, sfDir)
    println(f"[wire-probe] total=$secs%.1fs")
    spark.stop()
  }
}
