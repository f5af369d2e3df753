package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.ChunkDispatcher

/** Model-based property test of the consumer-dispatch semantics
  * (ack-wait redelivery, competing consumers, bounded batches): random
  * interleavings of offer/ack/expire/session-death are replayed against
  * a trivially-correct sequential model, and the JetStream invariants
  * are asserted after every step:
  *
  *  1. a chunk is in flight to AT MOST one session at a time;
  *  2. a settled (acked) chunk is never offered again;
  *  3. delivery counts are monotone and bump exactly on offer;
  *  4. an offerable chunk (never offered / owner dead / deadline past)
  *     is ALWAYS claimed by the next pull with capacity — no lost
  *     chunks;
  *  5. concurrent pulls by two sessions split the pending set
  *     disjointly;
  *  6. fair dispatch: with ≥2 live sessions a pull claims at most its
  *     deficit share ceil(pending / live) − inFlight (JetStream's
  *     rough round-robin, handler.rs:21-25) — the model computes the
  *     same cap, so the property run exercises it on every pull.
  */
class ChunkDispatcherSpec extends AnyFunSuite {
  private val G = "g"
  private val ACK_WAIT = 100L

  private case class ModelFlight(session: Long, offeredAt: Long, deliveries: Int)

  test("random op sequences preserve the dispatch invariants vs a sequential model") {
    val seeds = (1 to 50).map(Seed(_))
    seeds.foreach { seed0 =>
      var now = 0L
      val d = new ChunkDispatcher(ACK_WAIT, () => now)
      // model state
      var flights = Map.empty[String, ModelFlight]
      var acked = Set.empty[String]
      var live = Set.empty[Long]
      val chunks = (0 until 8).map(i => s"c$i")
      val sessions = (1 to 3).map(_ => d.newSessionId())

      def offerable(c: String): Boolean =
        !acked.contains(c) && (flights.get(c) match {
          case None => true
          case Some(f) => !live.contains(f.session) || now >= f.offeredAt + ACK_WAIT
        })

      val opGen: Gen[Int] = Gen.chooseNum(0, 99)
      var seed = seed0
      (1 to 200).foreach { _ =>
        val (op, s2) = opGen.apply(Gen.Parameters.default, seed)
          .map(v => (v, seed.next)).getOrElse((0, seed.next))
        seed = s2
        op match {
          case o if o < 40 => // pull by a random session, random max
            val sid = sessions((o / 2) % sessions.size)
            live += sid; d.openSession(G, sid)
            val max = 1 + o % 4
            val pending = chunks.filterNot(acked.contains)
            // fair-dispatch mirror: deficit share when sessions compete
            val fairCap =
              if (live.size <= 1) Int.MaxValue
              else {
                val held = flights.values.count(f =>
                  f.session == sid && live.contains(f.session) &&
                    now < f.offeredAt + ACK_WAIT)
                math.max(0, (pending.size + live.size - 1) / live.size - held)
              }
            val expected = pending.filter(offerable).take(math.min(max, fairCap))
            val got = d.offer(G, sid, pending, max)
            assert(got == expected,
              s"claim mismatch: got $got expected $expected (now=$now flights=$flights)")
            got.foreach { c =>
              val prev = flights.get(c).map(_.deliveries).getOrElse(0)
              flights += c -> ModelFlight(sid, now, prev + 1)
              // invariant 3: count bumps exactly on offer
              assert(d.deliveries(G, c) == prev + 1)
            }
          case o if o < 60 => // ack the lowest in-flight chunk
            // invariant 2 (settled never re-offered) lives at the engine
            // layer: pull() filters acked chunks before consulting the
            // dispatcher — EventEngineSpec/EventSessionSpec pin it. Here
            // acked chunks simply leave the offered set (see `pending`).
            flights.keys.toSeq.sorted.headOption.foreach { c =>
              acked += c; flights -= c
              d.settle(G, c)
            }
          case o if o < 75 => // session death
            val sid = sessions(o % sessions.size)
            live -= sid; d.closeSession(G, sid)
          case o if o < 90 => // time advance (maybe past the deadline)
            now += (if (o % 2 == 0) ACK_WAIT + 1 else ACK_WAIT / 3)
          case _ => // session revival
            val sid = sessions.head
            live += sid; d.openSession(G, sid)
        }
        // invariant 1+3: dispatcher flight state mirrors the model exactly
        chunks.foreach { c =>
          val df = d.flight(G, c)
          val mf = if (acked.contains(c)) None else flights.get(c)
          assert(df.map(f => (f.sessionId, f.offeredAt, f.deliveries)) ==
            mf.map(f => (f.session, f.offeredAt, f.deliveries)),
            s"flight divergence on $c: dispatcher=$df model=$mf")
        }
      }
    }
  }

  test("true-parallel pulls from 8 threads never double-claim, never lose a chunk, and split fairly") {
    val d = new ChunkDispatcher(1000L, () => 0L)
    val chunks = (0 until 1000).map(i => s"c$i")
    val sessions = (1 to 8).map(_ => d.newSessionId())
    sessions.foreach(d.openSession(G, _))
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Seq[String]]()
    val threads = sessions.map { sid =>
      new Thread(() => { results.put(sid, d.offer(G, sid, chunks, 200)); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val claims = results.values.asScala.toSeq
    val union = claims.flatten
    assert(union.size == union.distinct.size, "a chunk was claimed twice across threads")
    assert(union.toSet == chunks.toSet,
      s"8 shares of ceil(1000/8)=125 cover 1000 chunks exactly; missing ${chunks.size - union.size}")
    assert(claims.forall(_.size == 125),
      s"fair dispatch: every session's share is exactly 1000/8, got ${claims.map(_.size)}")
    assert(d.counters._1 == 1000L, "offer counter must equal total claims")
  }

  test("fair dispatch: unbounded competing pulls split the backlog with imbalance <= 1 share; failover unchanged") {
    var now = 0L
    val d = new ChunkDispatcher(1000L, () => now)
    val Seq(s1, s2, s3) = (1 to 3).map(_ => d.newSessionId())
    Seq(s1, s2, s3).foreach(d.openSession(G, _))
    val pending = (0 until 10).map(i => s"c$i")
    // ceil(10/3) = 4: first two pullers take 4 each, the third the rest
    val a = d.offer(G, s1, pending)
    val b = d.offer(G, s2, pending)
    val c = d.offer(G, s3, pending)
    assert(Seq(a.size, b.size, c.size) == Seq(4, 4, 2),
      s"deficit shares must bound each unbounded pull: ${Seq(a, b, c)}")
    assert((a ++ b ++ c).toSet == pending.toSet, "no chunk may be lost to the cap")
    // a holder with its share in flight gets nothing more this round
    assert(d.offer(G, s1, pending).isEmpty,
      "a session already holding its share must not claim past its deficit")
    // s1 acks everything it held: its next pull is capped by the share
    // of what is still pending, all of which is in flight to s2/s3
    a.foreach(d.settle(G, _))
    val afterAck = d.offer(G, s1, pending.filterNot(a.contains))
    assert(afterAck.isEmpty, "competitors' valid flights are not claimable")
    // s3 dies: its chunks fail over to a survivor despite the cap
    d.closeSession(G, s3)
    val failedOver = d.offer(G, s1, pending.filterNot(a.contains))
    assert(failedOver.toSet == c.toSet,
      s"dead session's chunks must fail over under fair dispatch, got $failedOver")
  }

  test("counters distinguish first offers, ack-wait redeliveries, and failovers") {
    var now = 0L
    val d = new ChunkDispatcher(100L, () => now)
    val (s1, s2) = (d.newSessionId(), d.newSessionId())
    d.openSession(G, s1)
    assert(d.offer(G, s1, Seq("a", "b")) == Seq("a", "b")) // 2 first offers
    now += 200
    assert(d.offer(G, s1, Seq("a")) == Seq("a"))           // 1 redelivery
    d.openSession(G, s2)
    d.closeSession(G, s1)
    assert(d.offer(G, s2, Seq("b")) == Seq("b"))           // 1 failover
    assert(d.counters == ((4L, 1L, 1L)))
  }

  test("two sessions pulling the same pending set claim disjoint chunks covering it") {
    var now = 0L
    val d = new ChunkDispatcher(1000L, () => now)
    val (s1, s2) = (d.newSessionId(), d.newSessionId())
    d.openSession(G, s1); d.openSession(G, s2)
    val pending = (0 until 10).map(i => s"c$i")
    val a = d.offer(G, s1, pending, 6)
    val b = d.offer(G, s2, pending, 6)
    assert((a.toSet & b.toSet).isEmpty, "invariant 5: disjoint claims")
    assert(a.size == 5 && b.size == 5,
      "fair dispatch: two competing batch-6 pulls split 10 chunks 5+5")
    assert((a ++ b).toSet == pending.toSet, "no lost chunks across the pair of pulls")
  }
}
