package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent
import scala.jdk.CollectionConverters._

/** JetStream-parity consumer dispatch over a delivery-chunk ledger:
  * ack-wait redelivery and competing consumers.
  *
  * The reference inherits both semantics from its broker's consumer
  * (`/root/reference/src/stream_handler/handler.rs:21-25` declares the
  * JetStream consumer; the ack loop is public_event_server.rs:363-384):
  *  - a message delivered but not acked within the consumer's ack-wait
  *    is redelivered automatically — no client restart required;
  *  - N clients pulling one consumer split messages: each message is in
  *    flight to exactly ONE client at a time, and an unacked message
  *    from a dead client fails over to the survivors.
  *
  * Here the unit of delivery is the chunk (micro-batch), and this class
  * is the single bookkeeping point both engines ([[EventEngine]],
  * [[MultiplexedDelivery]]) consult at pull time:
  *
  *  - a chunk is OFFERABLE to session S when it is unacked and
  *    (never offered) ∨ (its flight's owner is no longer live)
  *    ∨ (its flight's ack-wait deadline has passed — including S's own
  *    flight: the silent-client redelivery);
  *  - offering atomically re-flights the chunk to S ([[offer]] runs the
  *    check-and-claim per chunk under the flight map's compute lock, so
  *    two concurrently pulling sessions can never both claim one chunk);
  *  - [[settle]] (on ack) clears the flight;
  *  - flights carry a delivery COUNT (JetStream `num_delivered`):
  *    monotone across redeliveries and, via [[restore]], across process
  *    restarts when the owning engine journals offers to its WAL.
  *
  * Time is injected (`clock`) so specs drive the ack-wait deadline
  * deterministically; production uses `System.currentTimeMillis`.
  *
  * Driver-side state, like the ledger it guards: O(pending chunks),
  * independent of event volume — the same scale as the reference's
  * in-server ack map.
  */
final class ChunkDispatcher(ackWaitMillis: Long,
                            clock: () => Long = () => System.currentTimeMillis()) {
  import ChunkDispatcher.Flight

  private val flights = new ConcurrentHashMap[(String, String), Flight]()
  private val live: concurrent.Map[(String, Long), Unit] =
    new ConcurrentHashMap[(String, Long), Unit]().asScala
  private val sessionIds = new AtomicLong(0L)

  // observability (JetStream surfaces num_redelivered per consumer;
  // these are the engine-wide equivalents an operator dashboards)
  private val offersTotal = new AtomicLong(0L)
  private val redeliveriesTotal = new AtomicLong(0L)
  private val failoversTotal = new AtomicLong(0L)

  /** Fresh session id (unique per dispatcher lifetime). */
  def newSessionId(): Long = sessionIds.incrementAndGet()

  def openSession(groupId: String, sessionId: Long): Unit =
    live.put((groupId, sessionId), ())

  /** Session death/close: its flights stay recorded (delivery counts
    * survive) but become immediately offerable to any live session. */
  def closeSession(groupId: String, sessionId: Long): Unit =
    live.remove((groupId, sessionId))

  def isLive(groupId: String, sessionId: Long): Boolean =
    live.contains((groupId, sessionId))

  def liveSessionCount(groupId: String): Int =
    live.keys.count(_._1 == groupId)

  /** Filter `chunkIds` to the ones offerable to `sessionId` NOW, and
    * claim each one atomically (per-key compute: concurrent pulls from
    * two sessions partition the chunks, never double-claim). Returns
    * the claimed ids in input order. `max` is the JetStream pull-batch
    * bound (`batch(n)`): claiming stops after `max` chunks, leaving the
    * rest unclaimed for competing sessions — the fairness knob when N
    * consumers drain one group. */
  def offer(groupId: String, sessionId: Long, chunkIds: Seq[String],
            max: Int = Int.MaxValue): Seq[String] = {
    val now = clock()
    var left = max
    chunkIds.filter { c =>
      left > 0 && {
        var claimed = false
        flights.compute((groupId, c), (_, f) => {
          val ownerDead = f != null && !isLive(groupId, f.sessionId)
          val expired = f != null && now >= f.offeredAt + ackWaitMillis
          if (f == null || ownerDead || expired) {
            claimed = true
            offersTotal.incrementAndGet()
            if (ownerDead) failoversTotal.incrementAndGet()
            else if (expired) redeliveriesTotal.incrementAndGet()
            Flight(sessionId, now, (if (f == null) 0 else f.deliveries) + 1)
          } else f
        })
        if (claimed) left -= 1
        claimed
      }
    }
  }

  /** Engine-wide dispatch counters since construction:
    * (total offers, ack-wait redeliveries, dead-session failovers). */
  def counters: (Long, Long, Long) =
    (offersTotal.get(), redeliveriesTotal.get(), failoversTotal.get())

  /** Ack settles the chunk: flight bookkeeping ends. */
  def settle(groupId: String, chunkId: String): Unit =
    flights.remove((groupId, chunkId))

  /** JetStream `num_delivered` for a chunk (0 = never offered). */
  def deliveries(groupId: String, chunkId: String): Int =
    Option(flights.get((groupId, chunkId))).map(_.deliveries).getOrElse(0)

  /** Current flight for a chunk, if any (exact offeredAt/count — what
    * a WAL-backed engine journals after a successful [[offer]]). */
  def flight(groupId: String, chunkId: String): Option[Flight] =
    Option(flights.get((groupId, chunkId)))

  /** WAL replay: restore a flight (offeredAt + count) from a journaled
    * offer record. The owning session is from a previous process and is
    * not live, so the chunk is immediately offerable — what restart
    * failover should do — while the delivery count stays monotone.
    * The id counter advances past every restored id so a session opened
    * AFTER replay can never collide with (and accidentally "own") a
    * dead process's flight. */
  def restore(groupId: String, chunkId: String, sessionId: Long,
              offeredAt: Long, deliveries: Int): Unit = {
    sessionIds.updateAndGet(cur => math.max(cur, sessionId))
    flights.put((groupId, chunkId), Flight(sessionId, offeredAt, deliveries))
  }

  def dropGroup(groupId: String): Unit = {
    flights.keySet.asScala.filter(_._1 == groupId)
      .foreach(flights.remove)
    live.keys.filter(_._1 == groupId).foreach(live.remove)
  }
}

object ChunkDispatcher {
  /** One in-flight delivery: who holds the chunk, since when, and how
    * many times it has been offered in total. */
  final case class Flight(sessionId: Long, offeredAt: Long, deliveries: Int)
}
