package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}
import graft.core._
import graft.streaming.{EventEngine, GrpcServer, H2c, Hpack, WireAdmin}
import graft.streaming.WireProtocol
import graft.streaming.WireProtocol._

/** The WireFuzzSpec treatment applied to the hand-rolled HTTP/2 stack
  * (round-8 verdict task 3): N-seed randomized lifecycle sessions over
  * LIVE sockets where every frame the client sends is fragmented across
  * arbitrary TCP writes, header blocks are randomly cut into
  * HEADERS+CONTINUATION chains (sometimes PADDED, sometimes
  * Huffman-coded), and each seed interleaves the adversarial transport
  * behaviors only a raw socket can exhibit:
  *
  *  - mid-FRAME and mid-HEADER-BLOCK disconnects (a torn 9-byte frame
  *    header; HEADERS without END_HEADERS then EOF) — the server must
  *    close that stream's session and re-offer its chunks;
  *  - garbage after (and instead of) the connection preface, oversized
  *    frame headers (24-bit length 0xFFFFFF), and CONTINUATION
  *    interleaving violations on sacrificial connections — the server
  *    must survive them all;
  *  - a zero INITIAL_WINDOW_SIZE (SETTINGS) that parks the server's
  *    writer mid-response until a WINDOW_UPDATE grant releases it —
  *    the RFC 7540 §6.9.2 wait-then-write path driven live;
  *  - undecodable gRPC DATA bodies on a bidi stream → grpc-status 2
  *    trailers on a connection that stays alive.
  *
  * Invariants (inherited from the in-process and framed-TCP fuzzes):
  * NO-DOUBLE-SERVE — every pushed notification lands on a connection
  * the chunk was offerable to (unacked; not held by another LIVE
  * connection inside its ack-wait); AT-LEAST-ONCE — after closing every
  * connection, a fresh drain serves every emitted event and leaves
  * nothing pending; and the server survives every seed (a final fresh
  * connection completes a full unary + bidi cycle).
  *
  * The server pump is disabled (pumpMillis = 1h) so every push is the
  * inline response to a client message — the same request-driven
  * determinism WireFuzzSpec gets from its Ok terminator, which is what
  * makes the serve-time offerability assertion sound. H2cSpec covers
  * the timed pump path. */
class H2cFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-h2c-fuzz")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val ACK_WAIT = 1000L

  import H2c._

  private def fb(f: Frame): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    H2c.writeFrame(new DataOutputStream(bos), f)
    bos.toByteArray
  }

  private def winUpdate(sid: Int, inc: Int): Frame =
    Frame(WINDOW_UPDATE, 0, sid, java.nio.ByteBuffer.allocate(4).putInt(inc).array())

  private def settingsFrame(pairs: (Int, Int)*): Frame = {
    val b = java.nio.ByteBuffer.allocate(6 * pairs.length)
    pairs.foreach { case (id, v) => b.putShort(id.toShort); b.putInt(v) }
    Frame(SETTINGS, 0, 0, b.array())
  }

  import H2cFuzzSpec._

  /** An h2c client that writes every frame in RANDOM SPLITS across
    * multiple TCP writes, randomly cuts header blocks into
    * HEADERS+CONTINUATION chains (sometimes PADDED / Huffman-coded),
    * and exposes the torn-write / raw-frame hooks the fuzz needs.
    * Reader thread mirrors [[graft.streaming.GrpcClient]]'s. */
  private final class FuzzConn(port: Int, rnd: scala.util.Random,
                               initialWindow: Option[Int] = None) {
    private val sock = new java.net.Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true); sock.setSoTimeout(120000) // liveness backstop, not a latency assertion (in-suite CPU steal)
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    private val raw = sock.getOutputStream
    private val writeLock = new Object
    private val enc = new Hpack
    private val dec = new Hpack
    private val huffman = rnd.nextBoolean()
    private var nextSid = 1

    private val queues = new ConcurrentHashMap[Int, LinkedBlockingQueue[Ev]]()
    private val bufs = new ConcurrentHashMap[Int, ByteArrayOutputStream]()
    private val headerBufs = new ConcurrentHashMap[Int, ByteArrayOutputStream]()
    private val gotHeaders = ConcurrentHashMap.newKeySet[Int]()

    private def writeSplit(bytes: Array[Byte]): Unit = {
      var i = 0
      while (i < bytes.length) {
        val k = 1 + rnd.nextInt(math.max(1, bytes.length - i))
        raw.write(bytes, i, k); raw.flush(); i += k
      }
    }

    def sendFrame(f: Frame): Unit = writeLock.synchronized { writeSplit(fb(f)) }

    // handshake: preface, SETTINGS (optionally zero INITIAL_WINDOW_SIZE),
    // a fat connection-level window grant
    writeLock.synchronized { raw.write(Preface); raw.flush() }
    initialWindow match {
      case Some(w) => sendFrame(settingsFrame(4 -> w))
      case None => sendFrame(Frame(SETTINGS, 0, 0, Array.emptyByteArray))
    }
    sendFrame(winUpdate(0, 1 << 24))

    private val reader = new Thread(() => {
      try {
        var open = true
        while (open) {
          val f = try H2c.readFrame(in) catch { case _: java.io.IOException => null }
          if (f == null) open = false
          else f.tpe match {
            case SETTINGS =>
              if ((f.flags & ACK) == 0)
                sendFrame(Frame(SETTINGS, ACK, 0, Array.emptyByteArray))
            case PING =>
              if ((f.flags & ACK) == 0) sendFrame(Frame(PING, ACK, 0, f.payload))
            case HEADERS | CONTINUATION =>
              val hb = headerBufs.computeIfAbsent(f.streamId,
                _ => new ByteArrayOutputStream())
              val frag = if (f.tpe == HEADERS) headersFragment(f.flags, f.payload)
                         else f.payload
              hb.write(frag, 0, frag.length)
              if ((f.flags & END_HEADERS) != 0) {
                val hs = dec.decode(hb.toByteArray).toMap
                hb.reset()
                val q = queues.get(f.streamId)
                if (q != null && hs.contains("grpc-status")) q.put(Trailers(hs))
                else gotHeaders.add(f.streamId)
              }
            case DATA =>
              val q = queues.get(f.streamId)
              if (q != null && f.payload.nonEmpty) {
                sendFrame(winUpdate(0, f.payload.length))
                sendFrame(winUpdate(f.streamId, f.payload.length))
                val buf = bufs.computeIfAbsent(f.streamId,
                  _ => new ByteArrayOutputStream())
                buf.write(f.payload, 0, f.payload.length)
                drainGrpcMessages(buf).foreach(m => q.put(Msg(m)))
              }
            case RST_STREAM =>
              val q = queues.get(f.streamId); if (q != null) q.put(Reset)
            case GOAWAY => open = false
            case _ => ()
          }
        }
      } catch { case _: Throwable => () }
    }, s"h2c-fuzz-reader-${sock.getPort}")
    reader.setDaemon(true); reader.start()

    /** HEADERS with the block randomly cut across CONTINUATION frames;
      * the first frame is randomly PADDED (RFC 7540 §6.2). */
    def openStream(path: String, metadata: Seq[(String, String)] = Seq.empty): Int = {
      val sid = { val s = nextSid; nextSid += 2; s }
      queues.put(sid, new LinkedBlockingQueue[Ev]())
      val hs = Seq((":method", "POST"), (":scheme", "http"), (":path", path),
        (":authority", "127.0.0.1"), ("content-type", "application/grpc"),
        ("te", "trailers")) ++ metadata
      val block = enc.encode(hs, huffman)
      val cuts = rnd.nextInt(3) // 0..2 CONTINUATION frames
      val points = Seq.fill(cuts)(1 + rnd.nextInt(math.max(1, block.length - 1)))
        .sorted.distinct.filter(p => p > 0 && p < block.length)
      val frags = (Seq(0) ++ points ++ Seq(block.length)).sliding(2).collect {
        case Seq(a, b) if b > a => java.util.Arrays.copyOfRange(block, a, b)
      }.toSeq
      writeLock.synchronized { // one contiguous header chain on the wire
        frags.zipWithIndex.foreach { case (frag, i) =>
          val lastOne = i == frags.length - 1
          if (i == 0) {
            val endH = if (lastOne) END_HEADERS else 0
            if (rnd.nextBoolean()) { // PADDED variant
              val pad = rnd.nextInt(5)
              val payload = Array(pad.toByte) ++ frag ++ Array.fill(pad)(0.toByte)
              writeSplit(fb(Frame(HEADERS, endH | PADDED, sid, payload)))
            } else writeSplit(fb(Frame(HEADERS, endH, sid, frag)))
          } else writeSplit(fb(Frame(CONTINUATION,
            if (lastOne) END_HEADERS else 0, sid, frag)))
        }
      }
      sid
    }

    def sendMsg(sid: Int, body: Array[Byte], endStream: Boolean = false): Unit =
      sendFrame(Frame(DATA, if (endStream) END_STREAM else 0, sid, grpcFrame(body)))

    /** One unary call: deterministic — terminates on the trailers. */
    def unary(path: String, body: Array[Byte],
              metadata: Seq[(String, String)] = Seq.empty,
              timeoutMs: Long = 30000): Int = {
      val sid = openStream(path, metadata)
      sendMsg(sid, body, endStream = true)
      awaitStatus(sid, timeoutMs)
    }

    def awaitStatus(sid: Int, timeoutMs: Long = 30000): Int = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var status = Int.MinValue
      while (status == Int.MinValue && System.nanoTime() < deadline) {
        queues.get(sid).poll(100, TimeUnit.MILLISECONDS) match {
          case Trailers(hs) => status = hs.getOrElse("grpc-status", "-1").toInt
          case Reset => status = -2
          case _ => ()
        }
      }
      status
    }

    /** Collects decoded stream responses until the queue stays quiet
      * (and at least `min` arrived, waiting up to `maxMs` for them). */
    def drainResponses(sid: Int, min: Int = 0, quietPolls: Int = 4,
                       maxMs: Long = 10000): Seq[WireResponse] = {
      val out = Seq.newBuilder[WireResponse]
      var got = 0; var quiet = 0
      val deadline = System.nanoTime() + maxMs * 1000000L
      while ((got < min && System.nanoTime() < deadline) || quiet < quietPolls) {
        queues.get(sid).poll(100, TimeUnit.MILLISECONDS) match {
          case Msg(m) => out += decodeResponse(m); got += 1; quiet = 0
          case null => quiet += 1
          case _ => quiet = 0
        }
      }
      out.result()
    }

    /** Abrupt drop tearing a frame: a strict prefix of a DATA frame's
      * bytes (sometimes inside the 9-byte header), then close. */
    def dropMidFrame(): Unit = {
      try writeLock.synchronized {
        val f = fb(Frame(DATA, 0, math.max(1, nextSid - 2),
          grpcFrame(encodeRequest(Ack(Seq.empty)))))
        raw.write(f, 0, 1 + rnd.nextInt(f.length - 1)); raw.flush()
      } catch { case _: java.io.IOException => () }
      close()
    }

    /** Abrupt drop mid-HEADER-BLOCK: HEADERS without END_HEADERS, EOF. */
    def dropMidHeaderBlock(): Unit = {
      try {
        val block = enc.encode(Seq((":method", "POST"), (":path", "/torn")))
        sendFrame(Frame(HEADERS, 0, nextSid, block.take(math.max(1, block.length / 2))))
      } catch { case _: java.io.IOException => () }
      close()
    }

    def close(): Unit = { try sock.close() catch { case _: Throwable => () } }
  }

  /** Sacrificial raw-socket adversaries: each must leave the server
    * serving other connections (proven by the per-seed probe). */
  private def rawAdversary(port: Int, rnd: scala.util.Random, kind: Int): Unit = {
    val sock = new java.net.Socket("127.0.0.1", port)
    sock.setTcpNoDelay(true)
    val out = sock.getOutputStream
    try kind match {
      case 0 => // garbage instead of the preface
        out.write(Array.fill(16 + rnd.nextInt(32))(rnd.nextInt(256).toByte)); out.flush()
      case 1 => // valid preface, then garbage frames
        out.write(Preface)
        out.write(Array.fill(24 + rnd.nextInt(64))(rnd.nextInt(256).toByte)); out.flush()
      case 2 => // oversized frame header: 24-bit length 0xFFFFFF, torn body
        out.write(Preface)
        out.write(fb(Frame(SETTINGS, 0, 0, Array.emptyByteArray)))
        out.write(Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, DATA.toByte, 0, 0, 0, 0, 1))
        out.write(Array.fill(64)(rnd.nextInt(256).toByte)); out.flush()
      case _ => // CONTINUATION interleaving violation: open header block, then DATA
        out.write(Preface)
        out.write(fb(Frame(SETTINGS, 0, 0, Array.emptyByteArray)))
        val enc = new Hpack
        val block = enc.encode(Seq((":method", "POST"), (":path", "/x")))
        out.write(fb(Frame(HEADERS, 0, 1, block))) // no END_HEADERS
        out.write(fb(Frame(DATA, END_STREAM, 1, grpcFrame(Array.emptyByteArray))))
        out.flush()
    } catch { case _: java.io.IOException => () }
    finally { try sock.close() catch { case _: Throwable => () } }
  }

  private def createBody(groupId: String, projectId: String): Array[Byte] =
    H2c.unwrapArm(encodeRequest(CreateGroup(groupId, "PROJECT", projectId,
      Hierarchy(projectId = projectId), includeSub = true, "ALL")))

  test("h2c lifecycle fuzz: split frames, CONTINUATION cuts, drops, garbage, zero windows (25 seeds)") {
    (1 to 25).foreach { seedNo =>
      val rnd = new scala.util.Random(9100L + seedNo)
      @volatile var now = 0L
      val engine = new EventEngine(spark,
        Trigger.ProcessingTime("250 milliseconds"), EngineSecurity.Permissive,
        ackWaitMillis = ACK_WAIT, clock = () => now)
      engine.createStreamGroup("g", ResourceType.Project, "p",
        Hierarchy(projectId = "p"), includeSubresources = true)
      // pump disabled: every push is the inline response to a client
      // message, so serve-time == drain-time for the model (see scaladoc)
      val server = new GrpcServer(engine, WireAdmin(engine),
        pumpMillis = 3600000L)

      var uidNext = 0
      var open = Map.empty[Int, (FuzzConn, Int)] // uid -> (conn, bidi sid)
      var acked = Set.empty[String]
      var flights = Map.empty[String, (Int, Long)]
      var emitted = Set.empty[String]
      var servedIds = Set.empty[String]
      var emits = 0

      def offerableTo(uid: Int, c: String): Boolean =
        !acked.contains(c) && (flights.get(c) match {
          case None => true
          case Some((owner, at)) =>
            owner == uid || !open.contains(owner) || now >= at + ACK_WAIT
        })

      def recordServed(uid: Int, rs: Seq[WireResponse], ctx: String): Seq[String] = {
        val notes = rs.collect { case n: Notification => n }
        notes.foreach { n =>
          assert(n.groupId == "g",
            s"seed $seedNo [$ctx]: foreign group ${n.groupId} on g's stream")
          assert(offerableTo(uid, n.chunkId),
            s"seed $seedNo [$ctx]: chunk ${n.chunkId} pushed to conn $uid while not " +
              s"offerable (acked=${acked.contains(n.chunkId)} " +
              s"flight=${flights.get(n.chunkId)} now=$now)")
          flights += n.chunkId -> (uid, now)
          servedIds ++= n.resourceIds
        }
        notes.map(_.chunkId)
      }

      def connect(ctx: String): Int = {
        val c = new FuzzConn(server.boundPort, rnd)
        val sid = c.openStream(GrpcServer.ReadMessagesPath)
        val uid = { uidNext += 1; uidNext }
        open += uid -> (c, sid)
        c.sendMsg(sid, encodeRequest(Init("g")))
        recordServed(uid, c.drainResponses(sid), ctx)
        uid
      }

      val admin = new FuzzConn(server.boundPort, rnd)

      // concurrent create / emit-into / re-attach / delete churn on side
      // groups over live h2c streams for the whole seed (the WireFuzzSpec
      // churn arm ported to this transport — round-10 verdict task 8):
      // group lifecycle races against the adversarial main loop and must
      // never disturb group g (churn lives in project q)
      @volatile var churnFailure: Throwable = null
      val churn = new Thread(() => {
        try {
          val c = new FuzzConn(server.boundPort, new scala.util.Random(seedNo))
          (0 until 2).foreach { i =>
            val gid = s"churn-$seedNo-$i"
            assert(c.unary(GrpcServer.CreatePath, createBody(gid, "q")) == 0,
              s"churn create $gid failed")
            assert(c.unary(GrpcServer.EmitPath, H2c.unwrapArm(encodeRequest(
              Emit("COLLECTION", "ALL", s"qc$i", RelationCtx(project = "q"))))) == 0,
              s"churn emit qc$i failed")
            // re-attach: a live bidi session on the churn group between
            // its create and its delete
            val sid = c.openStream(GrpcServer.ReadMessagesPath)
            c.sendMsg(sid, encodeRequest(Init(gid)))
            c.sendMsg(sid, encodeRequest(Close))
            assert(c.awaitStatus(sid) == 0, s"churn bidi on $gid failed")
            assert(c.unary(GrpcServer.DeletePath,
              H2c.unwrapArm(encodeRequest(DeleteGroup(gid)))) == 0,
              s"churn delete $gid failed")
          }
          c.close()
        } catch { case t: Throwable => churnFailure = t }
      }, s"h2c-fuzz-churn-$seedNo")
      churn.start()

      (1 to 14).foreach { step =>
        rnd.nextInt(100) match {
          case o if o < 14 => // emit through the h2c unary surface
            if (emits < 4) {
              engine.attach("g")
              val rid = s"c$seedNo-$emits"
              assert(admin.unary(GrpcServer.EmitPath, H2c.unwrapArm(encodeRequest(
                Emit("COLLECTION", "ALL", rid, RelationCtx(project = "p"))))) == 0,
                s"seed $seedNo: emit $rid failed")
              engine.processAllAvailable()
              emitted += rid; emits += 1
            }
          case o if o < 26 => // open a competing bidi connection
            if (open.size < 3) { connect(s"init@$step"); () }
          case o if o < 42 => // poll (empty Ack) on a random live connection
            open.toSeq.sortBy(_._1).lift(o % 3).foreach { case (uid, (c, sid)) =>
              c.sendMsg(sid, encodeRequest(Ack(Seq.empty)))
              recordServed(uid, c.drainResponses(sid), s"poll@$step"); ()
            }
          case o if o < 54 => // holder acks one of its valid flights
            flights.toSeq.sortBy(_._1).collectFirst {
              case (ch, (owner, at)) if open.contains(owner) &&
                now < at + ACK_WAIT && !acked.contains(ch) => (ch, owner)
            }.foreach { case (ch, owner) =>
              val (c, sid) = open(owner)
              c.sendMsg(sid, encodeRequest(Ack(Seq(ch))))
              acked += ch; flights -= ch
              val rs = c.drainResponses(sid)
              assert(!rs.exists(_.isInstanceOf[WireError]),
                s"seed $seedNo: own ack of $ch errored: $rs")
              recordServed(owner, rs, s"ack@$step"); ()
            }
          case o if o < 62 => // foreign ack → SessionError pushed on the stream
            (for {
              (ch, (owner, at)) <- flights.toSeq.sortBy(_._1)
              if open.contains(owner) && now < at + ACK_WAIT && !acked.contains(ch)
              (uid, cs) <- open.toSeq.sortBy(_._1) if uid != owner
            } yield (ch, uid, cs)).headOption.foreach { case (ch, uid, (c, sid)) =>
              c.sendMsg(sid, encodeRequest(Ack(Seq(ch))))
              val rs = c.drainResponses(sid, min = 1)
              assert(rs.collect { case WireError(m) => m }
                .exists(_.contains("in flight to another session")),
                s"seed $seedNo: foreign ack of $ch not rejected over h2c: $rs")
              recordServed(uid, rs, s"foreignAck@$step"); ()
            }
          case o if o < 70 => // graceful close: Close message → status-0 trailers
            open.toSeq.sortBy(_._1).lift(o % 3).foreach { case (uid, (c, sid)) =>
              recordServed(uid, c.drainResponses(sid), s"preClose@$step")
              c.sendMsg(sid, encodeRequest(Close))
              assert(c.awaitStatus(sid) == 0,
                s"seed $seedNo: clean Close must trail grpc-status 0")
              c.close(); open -= uid
            }
          case o if o < 78 => // abrupt drop: torn frame or torn header block
            open.toSeq.sortBy(_._1).lift(o % 3).foreach { case (uid, (c, _)) =>
              if (o % 2 == 0) c.dropMidFrame() else c.dropMidHeaderBlock()
              open -= uid
            }
          case o if o < 84 => // clock advance (maybe past ack-wait)
            now += (if (o % 2 == 0) ACK_WAIT + 500 else ACK_WAIT / 3)
          case o if o < 92 => // sacrificial raw adversary, then server must serve
            rawAdversary(server.boundPort, rnd, o % 4)
          case _ => // garbage gRPC body on a live bidi → status-2 trailers
            open.toSeq.sortBy(_._1).headOption.foreach { case (uid, (c, sid)) =>
              recordServed(uid, c.drainResponses(sid), s"preGarbage@$step")
              val junk = Array.fill(4 + rnd.nextInt(12))(rnd.nextInt(256).toByte)
              c.sendMsg(sid, junk)
              assert(c.awaitStatus(sid) == 2,
                s"seed $seedNo: garbage bidi body must trail grpc-status 2")
              c.close(); open -= uid
            }
        }
      }

      churn.join(60000)
      assert(churnFailure == null, s"seed $seedNo: h2c churn thread failed: $churnFailure")

      // zero-window stall-and-release: SETTINGS INITIAL_WINDOW_SIZE=0
      // parks the server's writer on the response DATA; the grant
      // releases it (RFC 7540 §6.9/§6.9.2 live)
      val zw = new FuzzConn(server.boundPort, rnd, initialWindow = Some(0))
      val zwSid = zw.openStream(GrpcServer.CreatePath)
      zw.sendMsg(zwSid, createBody(s"zw-$seedNo", "q"), endStream = true)
      // the trailers ride BEHIND the flow-controlled DATA in the writer
      // queue: if they arrive before any grant, the zero window was
      // never honored
      assert(zw.awaitStatus(zwSid, timeoutMs = 300) == Int.MinValue,
        s"seed $seedNo: response completed through a zero send window")
      zw.sendFrame(winUpdate(zwSid, 70000))
      assert(zw.awaitStatus(zwSid) == 0,
        s"seed $seedNo: zero-window create must complete after the grant")
      assert(admin.unary(GrpcServer.DeletePath,
        H2c.unwrapArm(encodeRequest(DeleteGroup(s"zw-$seedNo")))) == 0)
      zw.close()

      // close every surviving connection, then drain through a fresh one
      open.foreach { case (_, (c, sid)) =>
        c.sendMsg(sid, encodeRequest(Close)); c.awaitStatus(sid); c.close()
      }
      open = Map.empty
      val drainUid = connect("drain-init")
      val (drain, drainSid) = open(drainUid)
      var toAck = {
        drain.sendMsg(drainSid, encodeRequest(Ack(Seq.empty)))
        recordServed(drainUid, drain.drainResponses(drainSid), "drain-first")
      }
      var rounds = 0
      while ((engine.pendingChunks("g").nonEmpty || toAck.nonEmpty) && rounds < 40) {
        drain.sendMsg(drainSid, encodeRequest(Ack(toAck)))
        toAck.foreach { ch => acked += ch; flights -= ch }
        toAck = recordServed(drainUid,
          drain.drainResponses(drainSid), s"drain$rounds")
        if (toAck.isEmpty && engine.pendingChunks("g").nonEmpty) {
          now += ACK_WAIT + 500
          engine.processAllAvailable()
        }
        rounds += 1
      }
      assert(engine.pendingChunks("g").isEmpty,
        s"seed $seedNo: drain left pending ${engine.pendingChunks("g").map(_.chunkId)}")
      assert(emitted.subsetOf(servedIds),
        s"seed $seedNo: events lost over h2c: ${emitted -- servedIds}")

      // the server survived the seed: a fresh connection completes a
      // full unary + bidi cycle
      val probe = new FuzzConn(server.boundPort, rnd)
      assert(probe.unary(GrpcServer.CreatePath, createBody(s"probe-$seedNo", "q")) == 0,
        s"seed $seedNo: post-fuzz unary probe failed")
      val pSid = probe.openStream(GrpcServer.ReadMessagesPath)
      probe.sendMsg(pSid, encodeRequest(Init(s"probe-$seedNo")))
      probe.sendMsg(pSid, encodeRequest(Close))
      assert(probe.awaitStatus(pSid) == 0,
        s"seed $seedNo: post-fuzz bidi probe failed")
      probe.close()

      drain.sendMsg(drainSid, encodeRequest(Close))
      drain.awaitStatus(drainSid); drain.close()
      admin.close()
      server.stop()
      engine.stop()
    }
  }
}

private object H2cFuzzSpec {
  /** Per-stream client-side events (top-level so type tests carry no
    * outer-instance check). */
  sealed trait Ev
  final case class Msg(bytes: Array[Byte]) extends Ev
  final case class Trailers(hs: Map[String, String]) extends Ev
  case object Reset extends Ev
}
