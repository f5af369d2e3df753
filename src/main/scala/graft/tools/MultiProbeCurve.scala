package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SelectionOps
import graft.sources.Tables
import graft.functions.DotProduct.dot_ff

/** The PROBE-COUNT curve for multi-probe SemDeDup (round-9 verdict
  * task 5 — the q191 k′-curve treatment applied to q195's one dial):
  * per p ∈ {1, 2, 4, 8}, measure
  *
  *  - pair recall vs the EXACT cos ≥ 0.45 ground truth (the q196
  *    condition generalized to `arrays_overlap` of the two probe
  *    sets),
  *  - candidate-pair volume (the p-dependent cost driver: within-cell
  *    enumeration grows ~p² in the occupancy-bounded regime), and
  *  - the wall time of the q195-shaped candidate + cos-verify pass.
  *
  * The priority table is EXCLUDED from the timed pass on purpose: it
  * is computed from the primary cell only, so its cost is
  * p-independent and would just flatten the curve's contrast. p = 1
  * reproduces q181's within-cell reach; p = 2 is the shipped q195.
  *
  * Usage: sbt "runMain graft.tools.MultiProbeCurve <sfDir> [p ...]"
  */
object MultiProbeCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
             else Seq(1, 2, 4, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nm", sqrt(dot_ff(col("embedding"), col("embedding"))))
      .localCheckpoint(true)
    val n = e.count()
    val k = SelectionOps.cellCount(n)
    // exact ground truth once (p-independent): the q158 dense tile
    // sweep (primitive-float loops — the naive non-equi join is ~50×
    // slower at 10×)
    val exact = graft.operators.VectorOps.densePairs(spark, sfDir, 0.45)
      .select("a", "b").localCheckpoint(true)
    val nExact = exact.count()
    println(s"[mpcurve] sf=$sfDir n=$n k=$k exact_pairs=$nExact")

    ps.foreach { p =>
      System.gc()
      val asg = SelectionOps.topPAssignment(e, k, p).localCheckpoint(true)
      // recall: pair caught iff the probe sets intersect
      val hits = exact
        .join(asg.select(col("vec_id").as("a"), col("cells").as("ca")), "a")
        .join(asg.select(col("vec_id").as("b"), col("cells").as("cb")), "b")
        .filter(arrays_overlap(col("ca"), col("cb")))
        .count()
      // timed: the q195-shaped candidate enumeration + cos verify
      val t0 = System.nanoTime()
      val probes = asg.select(col("vec_id"), explode(col("cells")).as("cell"))
      val pa = probes.join(e, "vec_id").select(col("cell"),
        col("vec_id").as("a"), col("embedding").as("av"), col("nm").as("na"))
      val pb = probes.join(e, "vec_id").select(col("cell"),
        col("vec_id").as("b"), col("embedding").as("bv"), col("nm").as("nb"))
      val cand = pa.join(pb, "cell").filter(col("a") < col("b"))
      val agg = cand
        .withColumn("cos", dot_ff(col("av"), col("bv")) / (col("na") * col("nb")))
        .agg(count(lit(1)).as("cand_rows"),
          sum(when(col("cos") >= 0.45, 1L).otherwise(0L)).as("found"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      val recallPpm = if (nExact == 0) 0L else hits * 1000000L / nExact
      println(f"[mpcurve] p=$p recall_ppm=$recallPpm hits=$hits " +
        f"cand_rows=${agg.getLong(0)} verified=${agg.getLong(1)} wall=$wall%.2fs")
    }
    spark.stop()
  }
}
