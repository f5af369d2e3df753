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
      case "x:simhash_sig" =>
        // q45's signature stage alone (explode -> conv -> 60-vote agg):
        // isolates the codegen-warmup cliff from the band join.
        val words = graft.sources.Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .select(col("doc_id"),
            expr("CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)").as("whv"))
        val voteCols = (0 until 60).map { bit =>
          val shift = (14 - bit / 4) * 4 + bit % 4
          sum(expr(s"CAST(shiftright(whv, $shift) & 1 AS INT) * 2 - 1")).as(s"v$bit")
        }
        words.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*).count()
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
      case "x:mg_lvl0" =>
        // q201's map-only per-doc MG summaries alone
        graft.operators.SketchOps.mgLevel0Of(
          graft.sources.Tables.load(spark, sfDir, "documents")).count()
      case "x:mg_tree" =>
        // level 0 + the full canonical merge tree (no eval side)
        val docs = graft.sources.Tables.load(spark, sfDir, "documents")
        val maxGid = docs.agg(max("doc_id")).collect().head.getLong(0)
        var st = graft.operators.SketchOps.mgLevel0Of(docs)
        var g = maxGid; var r = 0
        while (g > 0 || r == 0) {
          st = graft.operators.SketchOps.mgMergeRound(st)
          g /= graft.operators.SketchOps.MgF; r += 1
        }
        st.count()
      case "x:mg_lvl0_shuffle" =>
        // the groupBy/window equivalent of mgLevel0Of (all codegen'd
        // standard operators, no interpreted higher-order functions)
        graft.operators.SketchOps.mgReduce(
          graft.operators.SketchOps.mgStreamOf(
            graft.sources.Tables.load(spark, sfDir, "documents"))
            .groupBy(col("doc_id").as("gid"), col("w"))
            .agg(count(lit(1)).cast("long").as("c"))).count()
      case "x:mg_exact" =>
        // the eval's exact ground-truth aggregation alone
        graft.operators.SketchOps.mgStreamOf(
          graft.sources.Tables.load(spark, sfDir, "documents"))
          .groupBy("w").agg(count(lit(1))).count()
      case "x:mg_tot" =>
        graft.operators.SketchOps.mgStreamOf(
          graft.sources.Tables.load(spark, sfDir, "documents")).count()
      case q => graft.SparkEntry.queries(q)(spark, sfDir).count()
    }
  }
}
