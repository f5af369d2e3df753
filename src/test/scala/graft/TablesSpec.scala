package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fixture-schema canary (round-7 verdict item #2).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped `events.ts` under two parquet encodings — TIMESTAMP(NANOS) in
  * rounds 1–5, then `timestamp[us]` with isAdjustedToUTC=false (read by
  * Spark as TIMESTAMP_NTZ) from round 6, which broke the strictly-typed
  * `unix_micros` in q96 at the driver's gate rather than in-repo. This
  * spec pins the POST-LOAD schema contract so the next encoding change
  * fails here first:
  *
  *  - every table loads through `Tables.load` with zero NTZ columns and
  *    the documented dtypes (ts/o_orderdate/l_shipdate = TimestampType,
  *    embedding = array<float>, …);
  *  - every `SparkEntry.queries` entry analyzes (resolves + type-checks)
  *    against the loaded schemas — catches strictly-typed expressions
  *    like unix_micros without executing anything;
  *  - a deliberately NTZ-written fixture copy is normalized by the
  *    loader (proving the canary is about the loader contract, not about
  *    whichever encoding the current fixtures happen to use).
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tables-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def dtypes(name: String): Map[String, DataType] =
    Tables.load(spark, dir, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("no table exposes TIMESTAMP_NTZ or raw-Long timestamps after load") {
    for (t <- Tables.all) {
      val bad = Tables.load(spark, dir, t).schema.fields.filter(_.dataType == TimestampNTZType)
      assert(bad.isEmpty, s"$t leaks NTZ columns: ${bad.map(_.name).mkString(",")}")
    }
    assert(dtypes("events")("ts") == TimestampType, "events.ts must normalize to TimestampType")
  }

  test("key fixture columns have the documented post-load dtypes") {
    val ev = dtypes("events")
    assert(ev("event_id") == LongType && ev("user_id") == LongType)
    assert(ev("event_type") == StringType && ev("value") == DoubleType)
    val emb = dtypes("embeddings")
    assert(emb("vec_id") == LongType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true)
      || emb("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${emb("embedding")}")
    val doc = dtypes("documents")
    assert(doc("doc_id") == LongType && doc("text") == StringType)
    val li = dtypes("lineitem")
    assert(li("l_shipdate") == TimestampType, s"l_shipdate: ${li("l_shipdate")}")
    assert(li("l_quantity") == DoubleType && li("l_linenumber") == IntegerType)
    assert(dtypes("orders")("o_orderdate") == TimestampType)
  }

  test("every SparkEntry query analyzes against the loaded schemas") {
    // sf0.001: analysis-only (resolution + type-check) except the few ops
    // with bounded eager driver state; strictly-typed expressions such as
    // q96's unix_micros fail right here on an encoding drift.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, "/root/testdata/sf0.001").queryExecution.analyzed; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("an NTZ-encoded events fixture is normalized by the loader") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ntz-fixture").toString
    spark.sql(
      """SELECT CAST(13 AS BIGINT) AS event_id,
        |       TIMESTAMPADD(HOUR, 7, TIMESTAMP_NTZ'2026-01-02 03:04:05') AS ts,
        |       CAST(1 AS BIGINT) AS user_id, 'purchase' AS event_type,
        |       CAST(1.5 AS DOUBLE) AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // The raw read really is NTZ (the canary has something to catch)…
    val raw = spark.read.parquet(s"$tmp/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    // …and the loader normalizes it, value-identically under UTC.
    val loaded = Tables.load(spark, tmp, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    val micros = loaded.selectExpr("unix_micros(ts)").as[Long].head()
    assert(micros == 1767323045000000L + 7L * 3600L * 1000000L,
      s"NTZ→TZ cast must preserve the wall-clock value under UTC, got $micros")
  }
}
