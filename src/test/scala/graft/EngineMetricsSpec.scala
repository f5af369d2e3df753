package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Millis, Seconds, Span}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.core._
import graft.streaming.{EngineMetrics, EventEngine}

/** The listener-bus observability layer: delivery progress shows up per
  * query, and a dying query keeps its exception for supervision. */
class EngineMetricsSpec extends AnyFunSuite with BeforeAndAfterAll with Eventually {

  implicit override val patienceConfig: PatienceConfig =
    PatienceConfig(timeout = Span(30, Seconds), interval = Span(200, Millis))

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-metrics-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("delivery progress is observable per query; rows are counted") {
    val metrics = EngineMetrics.attach(spark)
    val engine = new EventEngine(spark, Trigger.ProcessingTime("250 milliseconds"))
    try {
      engine.createStreamGroup("mg", ResourceType.Project, "p",
        Hierarchy(projectId = "p"), includeSubresources = true)
      engine.emit(ResourceType.Project, EventType.All, "p", RelationCtx())
      engine.processAllAvailable()
      // listener events are asynchronous — poll the snapshot
      eventually {
        val s = metrics.snapshot.get("delivery-mg")
        assert(s.exists(q => q.batches >= 1 && q.inputRows >= 1),
          s"expected progress for delivery-mg, got ${metrics.snapshot.keySet}")
      }
      assert(metrics.failures.isEmpty)
    } finally engine.stop()
  }

  test("a query that dies keeps its exception in the failure map") {
    val metrics = EngineMetrics.attach(spark)
    val s = spark
    import s.implicits._
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int](spark, numPartitions = 1)
    val q = source.toDF().writeStream
      .queryName("doomed")
      .outputMode("append")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        throw new RuntimeException("boom: simulated sink failure")
      }
      .start()
    source.addData(1)
    intercept[Exception] { q.processAllAvailable() }
    eventually {
      assert(metrics.failures.values.exists(_.contains("boom")),
        s"the doomed query's exception must be retained, got ${metrics.failures}")
    }
  }
}
