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

  test("graft_l2_slice computes the windowed squared distance from SQL") {
    GraftExtensions.register(spark)
    // vectors (1,2,3,4) vs (1,0,0,1): slice [1,3) -> (2-0)^2 + (3-0)^2 = 13
    val r = spark.sql(
      "SELECT graft_l2_slice(" +
        "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT), CAST(3 AS FLOAT), CAST(4 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT), CAST(1 AS FLOAT)), 1, 2) AS d")
      .head().getDouble(0)
    assert(r == 13.0)
    // 2-arg whole-vector form: 0 + 4 + 9 + 9 = 22
    val whole = spark.sql(
      "SELECT graft_l2_slice(" +
        "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT), CAST(3 AS FLOAT), CAST(4 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT), CAST(0 AS FLOAT), CAST(1 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(whole == 22.0)
    // slice past the end clamps to the shared prefix (ragged contract)
    val clamped = spark.sql(
      "SELECT graft_l2_slice(array(CAST(1 AS FLOAT)), array(CAST(3 AS FLOAT)), 0, 99) AS d")
      .head().getDouble(0)
    assert(clamped == 4.0)
  }

  test("graft_l2_slice demands literal slice bounds and float arrays") {
    GraftExtensions.register(spark)
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT graft_l2_slice(array(CAST(1 AS FLOAT)), array(CAST(1 AS FLOAT)), " +
        "CAST(rand() * 4 AS INT), 2) AS d").collect()
    }
    assert(nonLiteral.getMessage.contains("integer literal"),
      s"non-foldable bounds must fail at build time: ${nonLiteral.getMessage.take(200)}")
    val badType = intercept[Exception] {
      spark.sql("SELECT graft_l2_slice(array(CAST(1.0 AS DOUBLE)), array(CAST(1.0 AS FLOAT))) AS d")
        .collect()
    }
    assert(badType.getMessage.contains("array<float>") || badType.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("L2SliceDistanceFF equals its |x|^2-2x.c+|c|^2 dot decomposition (property)") {
    // the fused loop and the three-dot decomposition are algebraically
    // equal but NOT floating-point equal in general; they must agree to
    // a few ulps on realistic magnitudes, and the fused form must agree
    // with a plain Scala reference fold EXACTLY (same operation order)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.L2Distance.l2_ff
    import graft.functions.DotProduct.dot_ff
    val gen = Gen.containerOfN[Array, Float](8, Gen.chooseNum(-2.0f, 2.0f))
    (1 to 50).foreach { i =>
      val p = Gen.Parameters.default
      val a = gen.pureApply(p, Seed(i))
      val b = gen.pureApply(p, Seed(i + 5000))
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
      val Array(fused, dxx, dxc, dcc) = df.select(
        l2_ff(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"), 0, 8),
        dot_ff(org.apache.spark.sql.functions.col("a"), org.apache.spark.sql.functions.col("a")),
        dot_ff(org.apache.spark.sql.functions.col("a"), org.apache.spark.sql.functions.col("b")),
        dot_ff(org.apache.spark.sql.functions.col("b"), org.apache.spark.sql.functions.col("b")))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      val reference = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        val dx = x.toDouble - y.toDouble; acc + dx * dx
      }
      assert(fused == reference, s"fused loop must match the sequential fold exactly (seed $i)")
      val decomposed = dxx - 2.0 * dxc + dcc
      assert(math.abs(fused - decomposed) <= 1e-12 * math.max(1.0, math.abs(fused)),
        s"decomposition drift beyond ulp noise (seed $i): $fused vs $decomposed")
    }
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
