package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2.2): every
  * entry has a same-schema DuckDB oracle in `oracleSql` unless the
  * operator is not SQL-expressible (engine sketches), in which case the
  * driver records a rows-only check.
  */
object SparkEntry {
  /** All registered operator modules. Order is presentation-only. */
  def modules: Seq[QueryModule] =
    Seq(Relational, Scalars, StreamingBatch, TextOps, DedupOps, VectorOps,
      MultimodalOps, ExtensionOps, PipelineOps, Reshape, CurationOps,
      RetrievalOps, AnalyticsOps, TemporalOps, StatsOps, GraphOps,
      CorpusOps, WarehouseOps, TpchOps, LayoutOps, SelectionOps, SketchOps)

  private lazy val allDefs: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    require(ds.map(_.name).distinct.size == ds.size, "duplicate query names")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — exercises scan, filter pushdown, partial+final hash
    * aggregation and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q10_agg_tpch_q1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
