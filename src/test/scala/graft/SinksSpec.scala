package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch sink surface (SURVEY.md §2.2 "Sink" row): parquet append with
  * partitioning, CSV round-trip, and append-mode idempotence of the
  * Verify dump format. */
class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sinks-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("partitioned parquet append round-trips and prunes") {
    val out = Files.createTempDirectory("graft-sink").toString
    val n = Tables.load(spark, dir, "nation")
    n.write.mode(SaveMode.Overwrite).partitionBy("n_regionkey").parquet(out)
    n.filter(col("n_regionkey") === 4).write.mode(SaveMode.Append)
      .partitionBy("n_regionkey").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 25 + n.filter(col("n_regionkey") === 4).count())
    val pruned = back.filter(col("n_regionkey") === 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.count() == 5)
  }

  test("CSV round-trip preserves values with header + explicit schema") {
    val out = Files.createTempDirectory("graft-csv").toString
    val r = Tables.load(spark, dir, "region")
    r.write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(r.schema).csv(out)
    assert(back.orderBy("r_regionkey").collect().toSeq
      == r.orderBy("r_regionkey").collect().toSeq)
  }

  test("JSON source round-trip preserves values with explicit schema") {
    val out = Files.createTempDirectory("graft-json").toString
    val n = Tables.load(spark, dir, "nation")
    n.write.mode(SaveMode.Overwrite).json(out)
    val back = spark.read.schema(n.schema).json(out)
    assert(back.orderBy("n_nationkey").collect().toSeq
      == n.orderBy("n_nationkey").collect().toSeq)
  }

  test("ORC round-trip preserves values") {
    val out = Files.createTempDirectory("graft-orc").toString
    val su = Tables.load(spark, dir, "supplier")
    su.write.mode(SaveMode.Overwrite).orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("s_suppkey").collect().toSeq
      == su.orderBy("s_suppkey").collect().toSeq)
  }

  test("sorted single-file parquet write preserves order (Verify dump contract)") {
    val out = Files.createTempDirectory("graft-ord").toString + "/q"
    Tables.load(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).coalesce(1)
      .write.parquet(out)
    val back = spark.read.parquet(out).collect()
    val prices = back.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices == prices.sorted.reverse, "file order must be the query order")
  }
}
