package graft.tools

import java.sql.Timestamp

import graft.core.ChunkMeta
import graft.streaming.ChunkLedger

/** Driver-ledger footprint probe (round-10 verdict task 5): measure the
  * in-memory cost of [[ChunkLedger]] at 10⁷ chunks and demonstrate the
  * acked-history eviction bound — resident size must track the UNACKED
  * window, not all-time chunk count. Pure JVM (no Spark): the ledger is
  * driver-side bookkeeping.
  *
  * Scenarios (default 10M chunks, 1000 groups):
  *  1. all pending          — the worst honest backlog: every meta resident;
  *  2. steady-state acking  — consumers keep up (ack each batch after the
  *     next arrives): resident ≈ groups, heap flat;
  *  3. all acked            — resident 0 regardless of history;
  *  4. pathological hold    — one chunk per group never acked while the
  *     rest ack: resident = O(acked above the stuck watermark) — the
  *     documented worst case, bounded by the stuck window, shown here to
  *     size it, not to hide it.
  *
  * Usage: runMain graft.tools.LedgerProbe [chunks] [groups]
  */
object LedgerProbe {
  private def heapMb(): Long = {
    (1 to 3).foreach(_ => System.gc())
    (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)
  }

  private def meta(g: Int, b: Long): ChunkMeta =
    ChunkMeta(s"group-$g", s"group-$g-$b", b, 100L, new Timestamp(0L), acked = false)

  def main(args: Array[String]): Unit = {
    val chunks = args.headOption.map(_.toLong).getOrElse(10000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(1000)
    val perGroup = chunks / groups
    println(s"[ledger-probe] $chunks chunks over $groups groups ($perGroup each)")
    val base = heapMb()

    // 1. all pending
    var l = new ChunkLedger
    var t0 = System.nanoTime()
    (0 until groups).foreach { g =>
      (0L until perGroup).foreach(b => l.record(meta(g, b)))
    }
    val recordSec = (System.nanoTime() - t0) / 1e9
    val pendingMb = heapMb() - base
    println(f"[ledger-probe] all-pending: record=${recordSec}%.1fs " +
      f"resident=${l.stats} heap=+${pendingMb}MB " +
      f"(${pendingMb * 1048576.0 / chunks}%.0f B/chunk)")

    // 3. ack everything in order — history must leave memory
    t0 = System.nanoTime()
    (0 until groups).foreach { g =>
      (0L until perGroup).foreach(b => l.ack(s"group-$g", s"group-$g-$b"))
    }
    val ackSec = (System.nanoTime() - t0) / 1e9
    val ackedMb = heapMb() - base
    val statsAfter = l.stats
    println(f"[ledger-probe] all-acked: ack=${ackSec}%.1fs " +
      f"resident=$statsAfter heap=+${ackedMb}MB")
    require(statsAfter._2 == 0L && statsAfter._3 == 0L,
      "acked history must be fully evicted")
    l = null // release before the next scenario

    // 2. steady-state: ack batch b when batch b+1 arrives
    val l2 = new ChunkLedger
    t0 = System.nanoTime()
    (0L until perGroup).foreach { b =>
      (0 until groups).foreach { g =>
        l2.record(meta(g, b))
        if (b > 0) l2.ack(s"group-$g", s"group-$g-${b - 1}")
      }
    }
    val steadySec = (System.nanoTime() - t0) / 1e9
    val steadyMb = heapMb() - base
    println(f"[ledger-probe] steady-state: drive=${steadySec}%.1fs " +
      f"resident=${l2.stats} heap=+${steadyMb}MB (one pending meta per group)")
    require(l2.stats._2 == groups.toLong, "steady state holds one pending per group")

    // 4. pathological: chunk 0 of each group never acked; everything
    // above it acked — the out-of-order retention worst case
    val l3 = new ChunkLedger
    val holdPerGroup = math.min(perGroup, 10000L) // bound the demo
    (0 until groups).foreach { g =>
      (0L until holdPerGroup).foreach(b => l3.record(meta(g, b)))
      (1L until holdPerGroup).foreach(b => l3.ack(s"group-$g", s"group-$g-$b"))
    }
    val holdMb = heapMb() - base
    println(f"[ledger-probe] stuck-watermark (worst case, $holdPerGroup/group): " +
      f"resident=${l3.stats} heap=+${holdMb}MB — retention is bounded by the " +
      f"stuck window, the operational signal to alert on")
  }
}
