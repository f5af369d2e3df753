package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.collection.concurrent
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Observability for the delivery queries — the SURVEY §2.1 R13 mapping
  * "errors ⇒ StreamingQueryListener" made concrete. The reference
  * surfaces failures through its in-stream error channel and log lines;
  * here every streaming query's lifecycle is captured once, engine-wide:
  *
  *  - progress: batches seen, cumulative input rows, latest
  *    rows/second and batch duration per query (the backpressure /
  *    throughput signals an operator watches at scale);
  *  - terminations: queries that died keep their exception string, so
  *    a supervisor can re-attach ([[EventEngine.attach]] restarts a
  *    closed group) or alert.
  *
  * Listener callbacks arrive on Spark's listener bus (asynchronous);
  * readers see eventually-consistent snapshots.
  */
final class EngineMetrics extends StreamingQueryListener {

  final case class QueryStats(
      name: String,
      batches: Long,
      inputRows: Long,
      lastRowsPerSecond: Double,
      lastBatchMillis: Long,
      error: Option[String])

  private val stats: concurrent.Map[String, QueryStats] =
    new ConcurrentHashMap[String, QueryStats]().asScala

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    val name = Option(e.name).getOrElse(e.id.toString)
    stats.put(name, QueryStats(name, 0L, 0L, 0.0, 0L, None))
    ()
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val prev = stats.getOrElse(name, QueryStats(name, 0L, 0L, 0.0, 0L, None))
    stats.put(name, prev.copy(
      batches = prev.batches + 1,
      inputRows = prev.inputRows + p.numInputRows,
      lastRowsPerSecond = p.inputRowsPerSecond,
      lastBatchMillis =
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)))
    ()
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    // the terminated event carries no name — record under the query id
    // (started/progress entries keyed by name stay untouched)
    e.exception.foreach { err =>
      val name = e.id.toString
      stats.put(name, stats.getOrElse(name,
        QueryStats(name, 0L, 0L, 0.0, 0L, None)).copy(error = Some(err)))
    }
    ()
  }

  /** Snapshot of every query seen so far (running or terminated). */
  def snapshot: Map[String, QueryStats] = stats.toMap

  /** Queries that terminated with an exception → its message. */
  def failures: Map[String, String] =
    stats.collect { case (k, s) if s.error.isDefined => k -> s.error.get }.toMap
}

object EngineMetrics {
  /** Attach a fresh collector to the session's listener bus. */
  def attach(spark: SparkSession): EngineMetrics = {
    val m = new EngineMetrics
    spark.streams.addListener(m)
    m
  }
}
