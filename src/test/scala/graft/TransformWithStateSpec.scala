package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Running delivered/acked/pending per group via a named ValueState.
  * Top-level (not nested in the suite): the processor ships to
  * executors and must not capture the test class. */
class LedgerProcessor extends StatefulProcessor[String, LedgerEvent, LedgerRow] {
  @transient private var state: ValueState[LedgerState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[LedgerState](
      "ledger", Encoders.product[LedgerState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[LedgerEvent],
      timerValues: TimerValues): Iterator[LedgerRow] = {
    val s0 = Option(state.get()).getOrElse(LedgerState(0L, 0L))
    val s1 = rows.foldLeft(s0) { (s, e) =>
      if (e.kind == "deliver") s.copy(delivered = s.delivered + 1)
      else s.copy(acked = s.acked + 1)
    }
    state.update(s1)
    Iterator.single(LedgerRow(key, s1.delivered, s1.acked, s1.delivered - s1.acked))
  }
}

/** The Spark-4 arbitrary-state API (`transformWithState` /
  * `StatefulProcessor`) applied to the delivery ledger — the successor
  * of `mapGroupsWithState` (StreamingWindowsSpec) with named state
  * variables, RocksDB-backed state and per-state TTL. This is the
  * engine's scale path for R12-style per-group state at 100 TB: state
  * lives in the per-partition store (spillable, incremental
  * checkpoints), never in one JVM map.
  *
  * Mirrors the reference's per-stream-group ack bookkeeping
  * (src/stream_handler/natsio.rs chunk ack map) as running
  * delivered/acked counters per group.
  */
class TransformWithStateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tws-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // transformWithState requires the RocksDB state store provider.
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .getOrCreate()

  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("transformWithState keeps a named per-group ledger across micro-batches") {
    val in = MemoryStream[LedgerEvent](spark, numPartitions = 1)
    val out = in.toDS()
      .groupByKey(_.groupId)
      .transformWithState(new LedgerProcessor, TimeMode.None(), OutputMode.Update())
    val q = out.writeStream.format("memory").queryName("tws_out")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(LedgerEvent("g1", "deliver"), LedgerEvent("g1", "deliver"),
        LedgerEvent("g2", "deliver"))
      q.processAllAvailable()
      in.addData(LedgerEvent("g1", "ack"), LedgerEvent("g2", "deliver"))
      q.processAllAvailable()
      val last = spark.table("tws_out")
        .groupBy("groupId").agg(org.apache.spark.sql.functions.max("pending").as("mx"),
          org.apache.spark.sql.functions.min("pending").as("mn"))
      // g1: batch1 pending 2, batch2 pending 1 (state carried over);
      // g2: batch1 pending 1, batch2 pending 2.
      val byGroup = spark.table("tws_out")
        .as[LedgerRow].collect().groupBy(_.groupId)
      assert(byGroup("g1").map(r => (r.delivered, r.acked, r.pending)).toSet
        == Set((2L, 0L, 2L), (2L, 1L, 1L)),
        s"g1 ledger must accumulate across batches: ${byGroup("g1").toSeq}")
      assert(byGroup("g2").map(r => (r.delivered, r.acked, r.pending)).toSet
        == Set((1L, 0L, 1L), (2L, 0L, 2L)),
        s"g2 ledger must accumulate across batches: ${byGroup("g2").toSeq}")
      assert(last.count() == 2)
    } finally q.stop()
  }
}
