package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.plans.{PartialTopKPerKeyExec, TopKPerKey}
import graft.sources.Tables

/** Contracts for the custom partial top-k-per-key operator
  * (graft.plans.TopKPerKey): exactness (prune is semantics-preserving
  * under a total order), plan shape (the custom exec node actually
  * plans, before the exchange), and the scale property it exists for
  * (bounded rows entering the shuffle). */
class TopKPruneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-topk-prune-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pruned top-k equals the unpruned window top-k exactly") {
    val pruned = Relational.q113_topk_pruned.run(spark, dir).collect().toSeq
    val exact = Relational.q21_topk_per_group.run(spark, dir).collect().toSeq
    assert(pruned == exact, "partial prune must not change the top-k result")
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

  test("the custom exec node plans via the injected strategy and bounds the shuffle input") {
    val df = Relational.q113_topk_pruned.run(spark, dir)
    df.collect()
    val execs = allNodes(df.queryExecution.executedPlan).collect {
      case p: PartialTopKPerKeyExec => p
    }
    assert(execs.nonEmpty, "PartialTopKPerKeyExec must appear in the physical plan")
    val in = execs.head.metrics("numInputRows").value
    val out = execs.head.metrics("numOutputRows").value
    assert(in == Tables.load(spark, dir, "orders").count(),
      "prune must see every fact row exactly once")
    assert(out < in, s"prune must reduce rows entering the exchange ($out !< $in)")
    // bounded by k * |keys| overall (partitions only lower this)
    val keys = Tables.load(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(out <= 3 * keys * 4, s"pruned volume must be O(k * keys * partitions)")
  }

  test("prune keeps ties correct: total order means a deterministic survivor set") {
    import spark.implicits._
    // 6 rows, one key, all the same score — tiebreak column id decides
    val df = Seq((1, 10.0, 1L), (1, 10.0, 2L), (1, 10.0, 3L),
      (1, 10.0, 4L), (1, 10.0, 5L), (1, 10.0, 6L))
      .toDF("k", "score", "id").repartition(3)
    val pruned = TopKPerKey.prune(df, Seq("k"),
      Seq(("score", true), ("id", false)), k = 2)
    // global exact top-2 under (score desc, id): ids 1 and 2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("id"))
    val ids = pruned.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"tie-broken survivors must be deterministic: $ids")
  }
}
