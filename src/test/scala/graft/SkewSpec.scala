package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key mitigation — the two tools a 100 TB shuffle join has against
  * a skewed key, demonstrated as executable contracts:
  *  - SALTING: fact rows fan the hot key across S salt values, the dim
  *    side replicates each key S times; the join key becomes
  *    (key, salt), so the hot key's rows spread over S tasks instead of
  *    one straggler. Correctness is unchanged (every fact row still
  *    meets its dim row exactly once).
  *  - AQE SKEW JOIN: adaptive execution detects an oversized partition
  *    at runtime and splits it without any query rewrite.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .getOrCreate()

  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  /** 100k-row fact where 90% of rows hit key 0; 16-key dim. */
  private lazy val fact = spark.range(100000)
    .select(col("id"),
      when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 16).as("k"))
  private lazy val dim = spark.range(16)
    .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))

  test("salting spreads the hot key across S tasks; join result is unchanged") {
    val S = 8
    // deterministic salt from the row id (content-addressed, not rand():
    // reproducible across retries and engines)
    val saltedFact = fact.withColumn("salt", pmod(col("id"), lit(S.toLong)))
    val saltedDim = dim.select(col("k"), col("payload"),
      explode(sequence(lit(0L), lit(S - 1L))).as("salt"))

    val plain = fact.join(dim, "k").select(col("id"), col("payload"))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .select(col("id"), col("payload"))
    assert(salted.orderBy("id").collect().toSeq ==
      plain.orderBy("id").collect().toSeq,
      "salting must not change the join result")

    // the balance claim, measured: max shuffle-partition share of the
    // fact side drops from ~the whole hot key to ~1/S of it
    def maxShare(df: org.apache.spark.sql.DataFrame, keys: Seq[String]): Double = {
      val counts = df.repartition(8, keys.map(col): _*)
        .select(spark_partition_id().as("p"))
        .groupBy("p").count().select(max("count")).as[Long].head()
      counts.toDouble / 100000.0
    }
    val unsaltedMax = maxShare(fact, Seq("k"))
    val saltedMax = maxShare(saltedFact, Seq("k", "salt"))
    assert(unsaltedMax >= 0.9, s"fixture must be skewed, got $unsaltedMax")
    // with 8 salts into 8 hash partitions, balls-in-bins collisions cap
    // the best case around 2-3 salt combos per partition (~0.22-0.34
    // share) — the contract is the multiple-fold spread, not perfection
    assert(saltedMax <= 0.4 && saltedMax < unsaltedMax / 2.0,
      s"salt must spread the hot key (max share $saltedMax vs $unsaltedMax)")
  }

  test("AQE splits a skewed sort-merge partition at runtime (skew=true in the final plan)") {
    val session = spark.newSession()
    session.conf.set("spark.sql.adaptive.enabled", "true")
    session.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    session.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // shrink the thresholds so the 90k-row hot partition counts as skew
    session.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    session.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    session.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val f = session.range(100000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 16).as("k"),
        // incompressible 32-char pad so the hot reducer's COMPRESSED
        // shuffle bytes (what skew detection measures) are unambiguous
        md5(col("id").cast("string")).as("pad"))
    val d = session.range(16)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))
    // consume the pad through the join so column pruning cannot strip it
    // from the shuffle (a constant-key-only shuffle compresses below any
    // skew threshold — found the hard way)
    val joined = f.join(d, "k")
      .select(sum(length(col("pad")) + length(col("payload"))).as("s"))
    joined.collect() // execute so AQE re-plans with runtime stats
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE should mark the hot partition's join as skew-handled:\n${finalPlan.take(2000)}")
  }
}
