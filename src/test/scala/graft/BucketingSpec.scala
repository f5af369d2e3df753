package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.sources.Tables

/** Co-located joins via bucketing — the pre-shuffle strategy for the
  * repeated big-fact joins of a 100 TB deployment: write both sides
  * `bucketBy(N, key)` once, and every subsequent equi-join on that key
  * runs WITHOUT a shuffle exchange on either side (and without a sort,
  * when `sortBy` matches the join key). The one-time bucketed write
  * amortizes over every downstream join/aggregation on the key. */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private val warehouse = java.nio.file.Files.createTempDirectory("graft-warehouse-").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    // force the sort-merge path so the exchange count is the signal
    // (broadcast would hide the co-location property being asserted)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("bucketed fact-fact join: zero exchanges under the join; sorts elided by sortBy") {
    val nBuckets = 8
    Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")

    val joined = spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_quantity")).as("qty"))
    val plan = joined.queryExecution
      .explainString(ExplainMode.fromString("simple"))

    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // ONE exchange total — the post-join groupBy. The join itself reads
    // both bucketed layouts in place; unbucketed inputs would need two
    // more exchanges (one per side) on every run.
    assert(exchanges(plan) == 1,
      s"bucketed join must not shuffle its inputs, got:\n$plan")

    // and the same query over the raw (unbucketed) parquet DOES pay
    // per-side shuffles — the property is the bucketing, not the data
    val raw = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_quantity")).as("qty"))
    val rawPlan = raw.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(exchanges(rawPlan) == 3,
      s"unbucketed baseline should shuffle both join inputs + the agg, got:\n$rawPlan")

    // correctness: bucketed and raw agree
    val a = joined.orderBy("o_custkey").collect().toSeq
    val b = raw.orderBy("o_custkey").collect().toSeq
    assert(a == b, "bucketed plan must produce identical results")
  }

  test("groupBy on the bucket key also runs shuffle-free") {
    val agg = spark.table("lineitem_bucketed")
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("qty"))
    val plan = agg.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(exchanges(plan) == 0,
      s"aggregation on the bucket key needs no exchange, got:\n$plan")
  }
}
