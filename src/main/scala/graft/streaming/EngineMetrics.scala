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

  /** A group whose watermark is stuck: `ackedResident` metas held
    * behind one unacked chunk of `blockerAgeMillis` age. */
  final case class StuckGroup(ledger: String, group: String,
                              ackedResident: Long, blockerAgeMillis: Long)

  private val ledgers: concurrent.Map[String, ChunkLedger] =
    new ConcurrentHashMap[String, ChunkLedger]().asScala

  /** Register a delivery engine's chunk ledger for stuck-watermark
    * monitoring (round-11 verdict task 6 — LedgerProbe measured the
    * stuck case at +2.5 GB and called it "the operational alert
    * signal"; this makes it one). */
  def watchLedger(name: String, ledger: ChunkLedger): Unit = {
    ledgers.put(name, ledger); ()
  }

  /** Groups whose acked-resident window exceeds `minResident` AND whose
    * watermark-blocking chunk is older than `minAgeMillis` — the alert
    * condition. Healthy groups (acks keeping up, resident window 0)
    * never appear regardless of backlog depth: a deep-but-draining
    * backlog is load, not a stuck watermark. */
  def stuckGroups(minResident: Long = 1, minAgeMillis: Long = 0,
                  nowMillis: Long = System.currentTimeMillis()): Seq[StuckGroup] =
    ledgers.toSeq.flatMap { case (name, l) =>
      l.stuckGauges(nowMillis).collect {
        case (grp, (res, age)) if res >= minResident && age >= minAgeMillis =>
          StuckGroup(name, grp, res, age)
      }
    }
}

object EngineMetrics {
  /** Attach a fresh collector to the session's listener bus. */
  def attach(spark: SparkSession): EngineMetrics = {
    val m = new EngineMetrics
    spark.streams.addListener(m)
    m
  }
}
