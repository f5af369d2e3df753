package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.collection.concurrent
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-query progress/health surface — the Spark-native replacement for
  * the reference's bounded error channel
  * (`/root/reference/src/server/public_event_server.rs:325,394-401`,
  * which feeds failures back into the client stream). A listener
  * observes EVERY delivery query in the session, so group health is
  * queryable without polling the queries themselves. */
final class EngineListener extends StreamingQueryListener {

  final case class QueryHealth(
      name: String,
      runId: String,
      batches: Long,
      rowsIn: Long,
      lastError: Option[String],
      terminated: Boolean)

  private val health: concurrent.Map[String, QueryHealth] =
    new ConcurrentHashMap[String, QueryHealth]().asScala

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    health.put(e.runId.toString,
      QueryHealth(Option(e.name).getOrElse(""), e.runId.toString, 0L, 0L, None, terminated = false))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    health.updateWith(p.runId.toString) {
      case Some(h) => Some(h.copy(batches = h.batches + 1,
        rowsIn = h.rowsIn + p.numInputRows))
      case None => Some(QueryHealth(Option(p.name).getOrElse(""),
        p.runId.toString, 1L, p.numInputRows, None, terminated = false))
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    health.updateWith(e.runId.toString) {
      case Some(h) => Some(h.copy(lastError = e.exception, terminated = true))
      case None => Some(QueryHealth("", e.runId.toString, 0L, 0L, e.exception, terminated = true))
    }

  /** Health rows, newest-run first per name. */
  def snapshot: Seq[QueryHealth] = health.values.toSeq.sortBy(_.name)

  def errors: Seq[QueryHealth] = snapshot.filter(_.lastError.isDefined)
}

object EngineListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): EngineListener = {
    val l = new EngineListener
    spark.streams.addListener(l)
    l
  }
}
