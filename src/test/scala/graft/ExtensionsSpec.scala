package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

/** The SQL-surface registration of native expressions. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r == 7.0, "1.5*4 + 2*0.5")
    val nullCase = spark.sql("SELECT graft_dot(NULL, array(CAST(1.0 AS FLOAT))) AS d")
      .head().isNullAt(0)
    assert(nullCase, "null propagates")
  }

  test("graft_dot rejects non-float-array inputs at analysis time") {
    GraftExtensions.register(spark)
    // array<double> would silently read the wrong 4 bytes per element at
    // runtime without the checkInputDataTypes gate (round-1 advice).
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(CAST(1.0 AS DOUBLE)), array(CAST(1.0 AS FLOAT))) AS d")
        .collect()
    }
    assert(e.getMessage.contains("array<float>") || e.getMessage.contains("DATATYPE_MISMATCH"),
      s"analysis-time type error expected, got: ${e.getMessage.take(200)}")
  }

  test("builder-time extensions wire the planner strategy") {
    // what spark.sql.extensions=graft.GraftExtensions would inject
    // (asserted through the extensions object itself — getOrCreate
    // ignores the conf once the shared test session exists)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val strategies = org.apache.spark.sql.graft.ExtensionsBridge
      .plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.TopKStrategy),
      s"injectPlannerStrategy must surface TopKStrategy, got: $strategies")
  }

  test("Graft facade: session + registered analytics views + SQL native function") {
    spark // force this suite's session so the facade adopts it
    val s = graft.Graft.session()
    val tables = graft.Graft.analytics(s, "/root/testdata/sf0.001")
    assert(tables.keySet.contains("embeddings") && tables("lineitem").count() == 6000)
    val selfDot = s.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS n2 FROM embeddings ORDER BY vec_id LIMIT 1")
      .head().getDouble(1)
    assert(math.abs(selfDot - 1.0) < 0.01, "unit-normalized embeddings: ||v||^2 ~ 1")
  }
}
