package graft.tools

import org.apache.spark.sql.SparkSession

/** Profiles the wire-replay scale gap (round-8 verdict task 4): runs
  * [[graft.Bench.wireReplaySeconds]] standalone so the produce/drain
  * split and the producer-count scaling are measurable without the
  * full bench. `SPARK_GRAFT_WIRE_PRODUCERS` / `SPARK_GRAFT_REPLAY_*`
  * env knobs apply as in the bench.
  *
  * Usage: sbt "runMain graft.tools.WireReplayProbe <sfDir> [wire|h2c]"
  * (default wire; `h2c` runs [[graft.Bench.h2cReplaySeconds]] — the
  * same stream through the HTTP/2 transport instead of framed TCP.)
  */
object WireReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args.length > 1) args(1) else "wire"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val secs = mode match {
      case "h2c" => graft.Bench.h2cReplaySeconds(spark, sfDir)
      case _     => graft.Bench.wireReplaySeconds(spark, sfDir)
    }
    println(f"[wire-probe] mode=$mode total=$secs%.1fs")
    spark.stop()
  }
}
