package graft.tools

import org.apache.spark.sql.SparkSession

/** Local perf iteration: run named queries repeatedly (warm JVM) and
  * print per-run seconds. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.Profile q43_dedup_ngram_jaccard"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    args.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n = run(spark, sfDir, name)
        printf("%s run%d %.2fs (%d rows)%n", name, i, (System.nanoTime() - t0) / 1e9, n)
      }
    }
    spark.stop()
  }

  /** Named experiments (x:*) for stage-level timing; else a registered query. */
  private def run(spark: SparkSession, sfDir: String, name: String): Long = {
    import org.apache.spark.sql.functions._
    def shingles = graft.sources.Tables.load(spark, sfDir, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(words) - 3)," +
          " i -> concat_ws(' ', words[i], words[i+1], words[i+2])))")).as("sh"))
    name match {
      case "x:shingles" => shingles.count()
      case "x:selfjoin" =>
        val sh = shingles
        val a = sh.select(col("doc_id").as("a"), col("sh"))
        val b = sh.select(col("doc_id").as("b"), col("sh"))
        a.join(b, Seq("sh")).filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("c")).count()
      case "x:selfjoin_hashed" =>
        val sh = shingles.select(col("doc_id"), xxhash64(col("sh")).as("sh"))
        val a = sh.select(col("doc_id").as("a"), col("sh"))
        val b = sh.select(col("doc_id").as("b"), col("sh"))
        a.join(b, Seq("sh")).filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("c")).count()
      case "x:replay" =>
        val sec = graft.Bench.streamReplaySeconds(spark, sfDir)
        (sec * 1000).toLong // report ms in the "rows" slot
      case q => graft.SparkEntry.queries(q)(spark, sfDir).count()
    }
  }
}
