package graft.operators

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the scratch-parquet memo the Shared* intermediates ride
  * on — pinned because every consumer assumes them silently:
  *  - build-once: concurrent consumers of one key share a single
  *    materialization (FutureTask single-shot run);
  *  - nest-safe: a build may itself consume another memo (SharedPairs
  *    builds on the shingle memo; the vector candidate memo builds on
  *    the bucket memo) — the FutureTask is CONSTRUCTED inside
  *    computeIfAbsent but RUN outside it, so nesting never re-enters a
  *    ConcurrentHashMap mapping function ("Recursive update");
  *  - failure-retryable: a build that throws does not poison its key
  *    with a cached exception. */
class ScratchMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scratch-memo-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("build runs exactly once under concurrent consumers of the same key") {
    val sp = spark
    import sp.implicits._
    val builds = new AtomicInteger(0)
    val threads = (1 to 6).map { _ =>
      new Thread(() => {
        val df = ScratchMemo("sms-conc", sp, "dirA") {
          builds.incrementAndGet()
          Seq(1, 2, 3).toDF("x")
        }
        assert(df.count() == 3)
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get() == 1, "concurrent consumers must share one materialization")
  }

  test("a build may consume another memo (nested build) without recursive-update failure") {
    val sp = spark
    import sp.implicits._
    val out = ScratchMemo("sms-outer", sp, "dirA") {
      // inner memo first materialized INSIDE the outer build — the
      // exact shape of SharedPairs-over-shingles and cands-over-buckets
      val inner = ScratchMemo("sms-inner", sp, "dirA") { Seq(10, 20).toDF("x") }
      inner.union(Seq(30).toDF("x"))
    }
    assert(out.count() == 3)
    // and the inner key is itself now memoized and readable
    assert(ScratchMemo("sms-inner", sp, "dirA") { fail("must not rebuild") }.count() == 2)
  }

  test("a failed build does not poison the key") {
    val sp = spark
    import sp.implicits._
    val boom = intercept[RuntimeException] {
      ScratchMemo("sms-flaky", sp, "dirA") { throw new RuntimeException("boom") }
    }
    assert(boom.getMessage == "boom")
    val df = ScratchMemo("sms-flaky", sp, "dirA") { Seq(1).toDF("x") }
    assert(df.count() == 1, "the key must be retryable after a failed build")
  }

  test("countOnce computes once per key and is independent per dir") {
    val sp = spark
    val runs = new AtomicInteger(0)
    def n(dir: String): Long =
      ScratchMemo.countOnce("sms-count", sp, dir) { runs.incrementAndGet(); 42L }
    assert(n("dirA") == 42L && n("dirA") == 42L && n("dirB") == 42L)
    assert(runs.get() == 2, "one compute per (tag, session, dir)")
  }
}
