package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.core._
import graft.streaming.MultiplexedDelivery

/** The multiplexed (one-query-for-all-groups) delivery path: same
  * semantics as the per-group engine, dynamic group add/remove without
  * query restarts. */
class MultiplexedDeliverySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mux-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("one query serves many groups with per-group filtered delivery") {
    val mux = new MultiplexedDelivery(spark)
    try {
      mux.addGroup("p1-tree", ResourceType.Project, "p1", Hierarchy(projectId = "p1"), true)
      mux.addGroup("p1-exact", ResourceType.Project, "p1", Hierarchy(projectId = "p1"), false)
      mux.addGroup("p2-tree", ResourceType.Project, "p2", Hierarchy(projectId = "p2"), true)
      mux.addGroup("c1-watch", ResourceType.Collection, "c1",
        Hierarchy(projectId = "p1", collectionId = "c1"), false)
      mux.start()

      mux.emit(ResourceType.Project, EventType.All, "p1", RelationCtx())
      mux.emit(ResourceType.Collection, EventType.All, "c1", RelationCtx(project = "p1"))
      mux.emit(ResourceType.Project, EventType.All, "p2", RelationCtx())
      mux.emit(ResourceType.Object, EventType.All, "o1",
        RelationCtx(project = "p2", collection = "c9", sharedObject = "s1",
          objectGroups = Seq("g1")))
      mux.processAllAvailable()

      def got(g: String): Set[String] = mux.pendingChunks(g).flatMap(_.resourceIds).toSet
      assert(got("p1-tree") == Set("p1", "c1"))
      assert(got("p1-exact") == Set("p1"))
      assert(got("p2-tree") == Set("p2", "o1"), "subtree sees the object event (both subjects)")
      assert(got("c1-watch") == Set("c1"))
    } finally mux.stop()
  }

  test("groups added after start take effect on the next micro-batch; acks work") {
    val mux = new MultiplexedDelivery(spark)
    try {
      mux.addGroup("early", ResourceType.Project, "p", Hierarchy(projectId = "p"), true)
      mux.start()
      mux.emit(ResourceType.Project, EventType.All, "p", RelationCtx())
      mux.processAllAvailable()
      assert(mux.pendingChunks("early").size == 1)
      assert(mux.pendingChunks("late").isEmpty)

      // dynamic subscription — no restart
      mux.addGroup("late", ResourceType.Project, "p", Hierarchy(projectId = "p"), true)
      mux.emit(ResourceType.Project, EventType.All, "p", RelationCtx())
      mux.processAllAvailable()
      assert(mux.pendingChunks("late").size == 1, "late group must see post-registration events")
      assert(mux.pendingChunks("early").size == 2)

      val chunk = mux.pendingChunks("late").head
      assert(mux.ack("late", chunk.chunkId))
      assert(mux.pendingChunks("late").isEmpty)
      assert(!mux.ack("late", "bogus"))

      mux.removeGroup("late")
      mux.emit(ResourceType.Project, EventType.All, "p", RelationCtx())
      mux.processAllAvailable()
      assert(mux.pendingChunks("late").isEmpty, "removed group receives nothing")
    } finally mux.stop()
  }

  test("WAL-backed mux: pending and acked chunks survive an engine restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mux-wal").toString
    val mux1 = new MultiplexedDelivery(spark, ledgerDir = Some(dir))
    try {
      mux1.addGroup("g", ResourceType.Project, "p", Hierarchy(projectId = "p"), true)
      mux1.start()
      mux1.emit(ResourceType.Project, EventType.All, "p", RelationCtx())
      mux1.processAllAvailable()
      mux1.emit(ResourceType.Collection, EventType.All, "c", RelationCtx(project = "p"))
      mux1.processAllAvailable()
      val pend = mux1.pendingChunks("g")
      assert(pend.size == 2)
      assert(mux1.ack("g", pend.head.chunkId))
    } finally mux1.stop()

    // "restart": a fresh mux over the same WAL dir — the unacked chunk is
    // re-served as pending, the acked one stays acked.
    val mux2 = new MultiplexedDelivery(spark, ledgerDir = Some(dir))
    val pending = mux2.pendingChunks("g")
    assert(pending.size == 1 && pending.head.resourceIds == Seq("c"),
      s"only the unacked chunk is pending after restart: $pending")
  }
}
