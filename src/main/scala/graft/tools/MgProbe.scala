package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q201 level-0 form shootout (round-10 verdict task 3 diagnosis): the
  * map-only higher-order-function form ([[graft.operators.SketchOps.mgLevel0Of]])
  * versus the shuffle-based groupBy+reduce form (`mgReduce(occ.groupBy)`),
  * which SketchSpec pins as bit-identical. HOFs (transform/filter/
  * array_sort-with-comparator) run on the INTERPRETED expression path —
  * no whole-stage codegen — and interpreted eval is what decays as the
  * JVM's call sites turn megamorphic over a long bench session, so this
  * probe times each form over several back-to-back runs in one JVM to
  * expose both the absolute cost and the decay slope.
  *
  * Usage: runMain graft.tools.MgProbe [sfDir] [reps]
  */
object MgProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SketchOps
    // args(2) = "pollute": run a few FOREIGN codegen'd aggregations
    // first (the calib shape). Generated classes all enter the same
    // BufferedRowIterator/eval call sites; once those go megamorphic
    // the JIT stops inlining them for everyone — the bench-discovered
    // state where q201 runs 2× its young-JVM cost for the rest of the
    // session. This knob reproduces "in-suite" with one variable.
    if (args.lift(2).contains("pollute")) {
      (1 to 4).foreach { _ =>
        spark.range(0L, 100000000L, 1L, 32)
          .select(xxhash64(col("id")).as("h"))
          .agg(expr("bit_xor(h)"), count(lit(1))).collect()
        ()
      }
      println("[mg-probe] polluted: 4 foreign codegen aggs ran first")
    }
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val n = mk.count()
        spark.catalog.clearCache()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[mg-probe] $label%-18s rows=${ts.head._1}%-9d " +
        ts.map(t => f"${t._2}%.1fs").mkString(" "))
    }

    time("level0_hof")(SketchOps.mgLevel0Of(docs))
    time("level0_groupby")(SketchOps.mgReduce(
      SketchOps.mgStreamOf(docs).groupBy(col("doc_id").as("gid"), col("w"))
        .agg(count(lit(1)).cast("long").as("c"))))
    spark.stop()
  }
}
