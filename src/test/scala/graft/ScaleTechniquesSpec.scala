package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

/** The explicit scale techniques of the design mandate: bucketed
  * co-located joins (no exchange on the join key) and salted skew
  * joins (equivalence + spread). */
class ScaleTechniquesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = {
    val wh = Files.createTempDirectory("graft-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-scale-spec")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables co-locate: the fact-fact join has no shuffle on the join key") {
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side on the join key:\n${plan.take(1500)}")
    val expected = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey").distinct().count() // orders with >=1 lineitem
    assert(joined.count() == expected)
  }

  test("salted join equals the plain join and spreads a hot key") {
    val li = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect()
    val salted = Skew.saltedJoin(li, o, bigKey = "l_orderkey", smallKey = "o_orderkey",
        bigIdentity = "l_linenumber", saltFactor = 4)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect()
    assert(plain.toSeq == salted.toSeq, "salting must not change join semantics")

    // the salt actually spreads rows of one key across buckets
    val spread = li.filter(col("l_orderkey") === 1)
      .withColumn("s", Skew.saltCol(col("l_linenumber"), 4))
      .select("s").distinct().count()
    assert(spread >= 2, "rows of a hot key must land in multiple salt buckets")
  }
}
