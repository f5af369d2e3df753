package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.core._
import graft.streaming.{EventEngine, EventSession}
import graft.streaming.EventSession._

/** The R13 bidi protocol (public_event_server.rs:192-446): init-first
  * enforcement, ack round-trips with pending re-delivery, the error
  * channel, close/re-attach, and the attach-time authz re-check. */
class EventSessionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-session-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newEngine(security: EngineSecurity = EngineSecurity.Permissive) =
    new EventEngine(spark, Trigger.ProcessingTime("250 milliseconds"), security)

  test("protocol: ack before init is rejected; init binds; acks settle; close stops") {
    val engine = newEngine()
    val session = new EventSession(engine)
    try {
      engine.createStreamGroup("g", ResourceType.Project, "p",
        Hierarchy(projectId = "p"), includeSubresources = true)
      engine.emit(ResourceType.Project, EventType.All, "p", RelationCtx())
      engine.processAllAvailable()

      // reference: "an init message needs to be send before any ack message"
      intercept[IllegalStateException] { session.handle(Ack(Seq("x"))) }
      // init on an unknown group fails pre-session (reference :249-270)
      intercept[NoSuchElementException] {
        new EventSession(engine).handle(Init("nope"))
      }

      val onInit = session.handle(Init("g"))
      val notes = onInit.collect { case n: Notification => n }
      assert(notes.size == 1, s"init must replay pending chunks, got $onInit")

      // ack the chunk: nothing pending afterwards
      val afterAck = session.handle(Ack(notes.map(_.chunk.chunkId)))
      assert(afterAck.isEmpty)

      // double-ack flows through the ERROR CHANNEL, not an exception
      val errs = session.handle(Ack(notes.map(_.chunk.chunkId)))
      assert(errs.collect { case e: SessionError => e }.size == 1)

      session.handle(Close)
      assert(!session.isOpen)
      // a fresh session re-attaches and resumes (close kept state)
      val s2 = new EventSession(engine)
      assert(s2.handle(Init("g")).isEmpty, "acked chunk must not be re-served")
    } finally engine.stop()
  }

  test("attach-time authz re-check applies inside the session protocol") {
    val grants = spark.createDataFrame(Seq(("alice", "PROJECT", "p", "READ")))
      .toDF("token", "resource_type", "resource_id", "action")
    val engine = newEngine(EngineSecurity(authz = Some(AuthzProvider.fromGrants(grants))))
    val session = new EventSession(engine)
    try {
      engine.createStreamGroup("g", ResourceType.Project, "p",
        Hierarchy(projectId = "p"), includeSubresources = true,
        token = Some("alice"))
      intercept[PermissionDeniedException] {
        session.handle(Init("g", token = Some("mallory")))
      }
      assert(!session.isOpen)
      assert(session.handle(Init("g", token = Some("alice"))).isEmpty)
      assert(session.isOpen)
    } finally engine.stop()
  }
}
