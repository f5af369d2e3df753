package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.PartialTopKPerKeyExec

/** The optimizer-rule rung of the TopKPerKey extension: a plain
  * `row_number() <= k` window filter — written with NO knowledge of the
  * custom operator — gets the bounded per-partition prune injected
  * automatically when the session runs with GraftExtensions. */
class TopKAutoPruneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  // extensions-enabled session (the deployment shape:
  // spark.sql.extensions=graft.GraftExtensions)
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-autoprune-spec")
    .withExtensions(new GraftExtensions)
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // the rule ships opt-in: Spark 4's InsertWindowGroupLimit covers the
    // idiom natively (see TopKAutoPrune scaladoc); this spec exercises
    // the opted-in behavior
    .config("spark.graft.topk.autoprune", "true")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** The q21 idiom, written the ordinary way — no TopKPerKey.prune. */
  private def topkQuery(s: SparkSession): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    s.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** Full physical traversal that crosses AQE stage boundaries (plain
    * collect() stops at AdaptiveSparkPlanExec / QueryStageExec). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(s.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  private def pruneExecs(df: DataFrame): Seq[PartialTopKPerKeyExec] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan).collect {
      case p: PartialTopKPerKeyExec => p
    }
  }

  test("a plain row_number()<=k filter gets the partial prune injected") {
    val df = topkQuery(spark)
    assert(pruneExecs(df).nonEmpty,
      "the optimizer rule must plant PartialTopKPerKey under the window")
    assert(pruneExecs(df).head.k == 3, "the prune bound must come from the filter")
  }

  test("auto-pruned results equal the unpruned plan row for row") {
    val auto = topkQuery(spark).collect().map(_.toSeq)
    spark.conf.set("spark.graft.topk.autoprune", "false")
    try {
      val plain = topkQuery(spark)
      assert(pruneExecs(plain).isEmpty, "conf off must disable the rewrite")
      assert(plain.collect().map(_.toSeq).toSeq == auto.toSeq,
        "rewrite must be result-invariant")
    } finally spark.conf.set("spark.graft.topk.autoprune", "true")
  }

  test("rn = 1 (argmax-per-key) prunes with k = 1") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"))
    assert(pruneExecs(df).headOption.map(_.k).contains(1))
  }

  test("a sibling partition aggregate blocks the rewrite (it reads pruned rows)") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wAll = Window.partitionBy("o_custkey")
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("n"))
    assert(pruneExecs(df).isEmpty,
      "count() over the partition must see ALL rows — pruning would corrupt it")
    // and the semantics check: n must be the FULL per-customer count even
    // though only 3 rows per customer survive the filter
    val row = df.filter(col("o_custkey") === df.agg(min("o_custkey")).head().getLong(0))
      .collect()
    assert(row.nonEmpty && row.forall(_.getLong(2) >= row.length))
  }

  test("filters without a rank bound are untouched") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 2) // a bottom-slice, not a top-k
      .select(col("o_custkey"), col("rn"))
    assert(pruneExecs(df).isEmpty)
  }
}
