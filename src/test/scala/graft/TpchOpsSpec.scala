package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TpchOps
import graft.sources.Tables

/** Semantic pins for the TPC-H completion module, beyond the DuckDB
  * hash gate: the two nontrivial DECORRELATIONS are re-derived from
  * their direct (correlated-style) Spark formulations on the sf0.001
  * fixture and must agree row-for-row. The oracle gate proves the Spark
  * and DuckDB texts agree; THESE tests prove the decorrelated text
  * means the same thing as the spec's correlated text.
  */
class TpchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tpch-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("q175 (Q21) aggregate decorrelation == direct EXISTS/NOT-EXISTS joins") {
    // Direct form: a late line qualifies iff a DIFFERENT supplier has a
    // line on the order (semi) and NO different supplier is late (anti).
    val f = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      .cache()
    val lateLines = f.filter(col("late")).select(col("ok"), col("sk")).distinct()
    val others = f.select(col("ok").as("ok2"), col("sk").as("sk2"),
      col("late").as("late2"))
    val withOther = lateLines.join(others,
      col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
    val otherLate = others.filter(col("late2"))
    val direct = withOther.join(otherLate,
        col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_anti")
      .groupBy("sk").agg(count(lit(1)).cast("long").as("numwait"))
      .join(Tables.load(spark, dir, "supplier"), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)

    val decorrelated = TpchOps.q175_tpch_q21.run(spark, dir)
    assert(decorrelated.collect().toSeq == direct.collect().toSeq)
    f.unpersist()
  }

  test("q173 (Q17) per-part-average join == direct correlated threshold") {
    // Re-derive the threshold per part with plain SQL AVG (double) only
    // to cross-check membership: the same LINES must be selected (the
    // fixture quantities are integral, far from any avg*0.2 boundary, so
    // the double-vs-decimal route cannot flip membership here).
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part").filter(col("p_brand") === "Brand#11")
    val avgByPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("aq"))
    val expectLines = li.join(part, col("l_partkey") === col("p_partkey"))
      .join(avgByPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .count()
    val pa = li.groupBy("l_partkey")
      .agg((sum(col("l_quantity").cast("decimal(38,2)")).cast("double") / count(lit(1))).as("avg_qty"))
      .withColumnRenamed("l_partkey", "pa_partkey")
    val gotLines = li.join(part, col("l_partkey") === col("p_partkey"))
      .join(pa, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .count()
    assert(gotLines == expectLines && gotLines > 0)
  }

  test("q177 (Q2) argmin rows are exactly the per-part minimum unit prices") {
    val rows = TpchOps.q177_tpch_q2.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // Recompute each part's true min unit price among European suppliers
    // directly and check every emitted row matches it.
    val truthDf = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.load(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .groupBy("l_partkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("true_min"))
    val truth = truthDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getLong(r.fieldIndex("p_partkey"))
      val mp = r.getDouble(r.fieldIndex("min_price"))
      assert(truth(pk) == mp, s"part $pk: emitted $mp, true min ${truth(pk)}")
    }
  }

  test("q168 (Q11) threshold really is scale-free 2x-mean and rows exceed it") {
    val out = TpchOps.q168_tpch_q11.run(spark, dir).collect()
    assert(out.nonEmpty)
    val values = out.map(_.getDouble(1))
    // Mean over ALL parts in the restricted view, recomputed directly.
    val v = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.load(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * col("l_quantity")).cast("decimal(38,4)")).cast("double").as("value"))
    val stats = v.agg(sum(col("value").cast("decimal(38,4)")).cast("double"), count(lit(1))).head()
    val mean = stats.getDouble(0) / stats.getLong(1)
    assert(values.forall(_ > 2.0 * mean))
    // and no qualifying part is missing
    val nQualifying = v.filter(col("value") > lit(2.0) * lit(mean)).count()
    assert(nQualifying == out.length)
  }

  test("q165 (Q4) semi-join counts match a distinct-orderkey re-derivation") {
    val got = TpchOps.q165_tpch_q4.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val expect = o.join(Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"))
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect && got.values.sum > 0)
  }
}
