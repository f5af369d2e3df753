package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (`TESTDATA.md`).
  *
  * All analytic queries read through here so schema quirks are handled in
  * exactly one place. Keep loads lazy and unmaterialized: the point is to
  * let Catalyst push filters/projections into the parquet scan, which a
  * cache() here would defeat at 100 TB.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val llm: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ llm

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's schema
    // converter rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as
    // Long and rebuild the timestamp at microsecond precision. `div`
    // (integer division) is mandatory: a double round-trip would lose
    // precision above 2^53 ns (~1970+104 days).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Register every table as a temp view for `spark.sql` surfaces. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
