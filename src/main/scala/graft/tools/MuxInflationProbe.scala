package graft.tools

import org.apache.spark.sql.SparkSession

/** One-variable reproduction harness for the `mux_groups` in-suite
  * inflation (round-11 verdict task 2): the bench row measured 248.7 s
  * at sf0.1/G=2000 INSIDE the full suite while the identical probe
  * standalone cost 68.7 s on a 10×-larger log. The q201 precedent
  * (BASELINE.md round-11) was megamorphic-JIT pollution reproducible
  * with one foreign codegen'd query; this probe applies the same
  * playbook to the delivery path:
  *
  *   phase 0: probe fresh-JVM (the standalone number)
  *   phase 1: probe again (same JVM — does it SELF-inflate?)
  *   phase 2: pollution step, selected by SPARK_GRAFT_POLLUTE:
  *              "calib"  – the 4 × range(10⁸) hash aggs (q201's variable)
  *              "suite"  – one untimed pass of every SparkEntry query
  *              "suite3" – three passes (the bench's actual prelude)
  *   phase 3: probe after pollution
  *
  * Between phases it prints JIT/code-cache counters
  * (CompilationMXBean, CodeHeap pools, loaded classes) so a code-cache
  * flush or compile-storm shows up next to the timing it explains.
  * The probe matches the bench row exactly: G=2000, churn, 8 batches,
  * competing consumers, same session confs as graft.Bench.
  *
  * Usage: SPARK_GRAFT_POLLUTE=suite sbt "runMain graft.tools.MuxInflationProbe [sfDir] [G]"
  */
object MuxInflationProbe {

  private def jitStats(): String = {
    import scala.jdk.CollectionConverters._
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
    val heaps = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(p => f"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=" +
        f"${p.getUsage.getUsed / 1e6}%.0f/${p.getUsage.getMax / 1e6}%.0fMB")
      .mkString(" ")
    f"compileMs=${comp.getTotalCompilationTime} loaded=${cls.getLoadedClassCount} $heaps"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val g = args.lift(1).map(_.toInt).getOrElse(2000)
    val pollute = sys.env.getOrElse("SPARK_GRAFT_POLLUTE", "suite")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.sources.Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    def probe(tag: String): Unit = {
      System.gc()
      val r = GroupScaleProbe.run(spark, rows, g)
      val p = r.phases
      def ph(k: String) = p.getOrElse(k, 0.0)
      println(f"[mux-inflate] $tag%-12s total=${r.totalSec}%7.1fs med=${r.batchMedianSec}%6.2fs " +
        f"max=${r.batchMaxSec}%6.2fs batch=${ph("batch")}%.1fs write=${ph("write")}%.1fs " +
        f"count=${ph("count")}%.1fs ledger=${ph("ledger")}%.1fs read=${ph("read")}%.1fs")
      println(s"[mux-inflate] $tag jit: ${jitStats()}")
    }

    println(s"[mux-inflate] start jit: ${jitStats()}")
    probe("fresh")
    probe("fresh-2nd")
    val passes = pollute match {
      case "calib" => 0
      case "suite" => 1
      case "suite3" => 3
      case other => other.toIntOption.getOrElse(1)
    }
    if (pollute == "calib") {
      import org.apache.spark.sql.functions.{col, count, expr, lit, xxhash64}
      (1 to 4).foreach { _ =>
        spark.range(0L, 100000000L, 1L, 32)
          .select(xxhash64(col("id")).as("h"))
          .agg(expr("bit_xor(h)"), count(lit(1))).collect()
        ()
      }
      println(s"[mux-inflate] polluted with calib (4 hash aggs)")
    } else {
      (1 to passes).foreach { i =>
        // NonFatal only: an OOM or other fatal JVM error must abort the
        // probe, not let a degraded session proceed to the "polluted"
        // pass and misattribute its timings to JIT pollution. Failed
        // pollution queries are counted so a partial pass is visible
        // next to the JIT stats.
        var failedQueries = 0
        graft.SparkEntry.queries.foreach { case (name, fn) =>
          try { fn(spark, sfDir).count(); () }
          catch { case scala.util.control.NonFatal(e) =>
            failedQueries += 1
            System.err.println(s"[mux-inflate] pollution query $name failed: ${e.getClass.getSimpleName}")
          }
        }
        spark.catalog.clearCache()
        println(s"[mux-inflate] polluted with suite pass $i/$passes" +
          (if (failedQueries > 0) s" ($failedQueries queries failed)" else ""))
      }
    }
    probe("polluted")
    probe("polluted-2nd")
    spark.stop()
  }
}
