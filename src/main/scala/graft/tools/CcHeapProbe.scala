package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q68 driver-threshold audit (round-10 verdict task 7): measure the
  * ACTUAL driver heap needed by [[graft.operators.DedupOps.clusterLabels]]'
  * in-process union-find branch at exactly the `smallGraphEdges`
  * boundary (5M symmetrized edges = 2.5M collected pairs), and time the
  * distributed star-contraction branch on the SAME graph so the
  * crossover is justified by numbers, not vibes.
  *
  * The synthetic graph is chains of 5 nodes (4 edges per group):
  * edge k = (5·(k div 4) + k mod 4, +1) — deterministic, worst-ish for
  * node count (nodes ≈ 1.25 × edges; the union-find sizing worst case
  * is 2 × edges when every edge introduces two fresh nodes).
  *
  * Heap is sampled every 20 ms by a daemon poller (peak-used minus the
  * post-GC baseline), which deliberately INCLUDES transient garbage —
  * "peak heap the driver must have free" is the operational number a
  * threshold must be sized against.
  *
  * Usage: runMain graft.tools.CcHeapProbe [pairs] (default 2500000)
  */
object CcHeapProbe {
  private def usedMb(): Long =
    (Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)

  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toLong).getOrElse(2500000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = spark.range(m)
      .select(expr("id DIV 4 * 5 + id % 4").as("a"))
      .select(col("a"), (col("a") + 1L).as("b"))
    println(s"[cc-heap] $m pairs (${2 * m} symmetrized edges), chains of 5")

    val peak = new AtomicLong(0L)
    @volatile var poll = true
    val poller = new Thread(() => {
      while (poll) { peak.accumulateAndGet(usedMb(), math.max); Thread.sleep(20) }
    }, "cc-heap-poller")
    poller.setDaemon(true)

    def measure(label: String, threshold: Long): Unit = {
      (1 to 3).foreach(_ => System.gc())
      val base = usedMb()
      peak.set(base)
      poll = true
      poller.synchronized { if (!poller.isAlive) poller.start() }
      val t0 = System.nanoTime()
      val n = graft.operators.DedupOps
        .clusterLabels(spark, pairs, smallGraphEdges = threshold).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (1 to 3).foreach(_ => System.gc())
      val retained = usedMb() - base
      println(f"[cc-heap] $label%-12s rows=$n%-9d wall=$sec%6.1fs " +
        f"peak=+${peak.get - base}%dMB retained=+${retained}%dMB (base ${base}MB)")
    }

    measure("driver", Long.MaxValue) // force the union-find branch
    measure("distributed", 0L)       // force star contraction, same graph
    poll = false
    spark.stop()
  }
}
