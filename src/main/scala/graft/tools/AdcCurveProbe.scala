package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.sources.Tables

/** The q191 shortlist-size CURVE (round-8 verdict task 5): sweep the
  * funnel's one dial — the ADC shortlist size k′ — and measure, per
  * k′ ∈ {10, 50, 100, 200}, the mean shortlist ceiling (recall@5 the
  * rerank can at best recover), the mean reranked recall (equal to the
  * ceiling by construction — exact distances on a superset re-find
  * every present truth member), and the wall time of the funnel at
  * that k′. The time axis is the cost story: the codes scan and LUT
  * join are k′-independent, so the marginal cost of a bigger
  * shortlist is only Q·k′ exact vector reads — which is why the curve
  * is cheap to climb until the ceiling saturates.
  *
  * Usage: sbt "runMain graft.tools.AdcCurveProbe <sfDir> [k' ...]"
  */
object AdcCurveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
             else Seq(10, 50, 100, 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.functions.L2Distance.l2_ff
    val e = Tables.load(spark, sfDir, "embeddings")
    ks.foreach { kp =>
      System.gc()
      val t0 = System.nanoTime()
      val (q, adc, exact) = VectorOps.adcParts(spark, sfDir)
      val shortlist = adc
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("adc_fp"), col("cid"))))
        .filter(col("rn") <= kp)
        .select(col("qid"), col("cid"))
      val reranked = shortlist
        .join(e.select(col("vec_id").as("cid"), col("embedding").as("cv")), Seq("cid"))
        .join(broadcast(q), Seq("qid"))
        .withColumn("d2", l2_ff(col("qv"), col("cv")))
        .withColumn("rrn", row_number().over(
          Window.partitionBy("qid").orderBy(col("d2"), col("cid"))))
        .filter(col("rrn") <= 5)
        .select(col("qid"), col("cid"), lit(1L).as("hit"))
      val row = exact
        .join(reranked, Seq("qid", "cid"), "left")
        .join(shortlist.withColumn("sl", lit(1L)), Seq("qid", "cid"), "left")
        .agg((sum(coalesce(col("hit"), lit(0L))) * lit(1000000L)
            / count(lit(1))).cast("long").as("recall_ppm"),
          (sum(coalesce(col("sl"), lit(0L))) * lit(1000000L)
            / count(lit(1))).cast("long").as("ceiling_ppm"))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[adc-curve] k'=$kp%-4d recall=${row.getLong(0) / 1e6}%.3f " +
        f"ceiling=${row.getLong(1) / 1e6}%.3f wall=$dt%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
