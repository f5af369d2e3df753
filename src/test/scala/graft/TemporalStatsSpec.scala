package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Semantic invariants for the round-4 operators (TemporalOps,
  * StatsOps, GraphOps, q100/q104). Exact-value correctness is the
  * DuckDB oracle's job (Verify); these assert the properties that must
  * hold at ANY scale — conservation laws, partition-totality, bound
  * shapes — i.e. the things that catch a wrong rewrite even when the
  * oracle is rewritten in lockstep.
  */
class TemporalStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-temporal-stats-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("sessionize partitions the event stream: per-session counts sum to the table (q96)") {
    val sessions = TemporalOps.q96_sessionize.run(spark, dir).cache()
    val total = Tables.load(spark, dir, "events").count()
    assert(sessions.agg(sum("n_events")).head.getLong(0) == total,
      "every event must land in exactly one session")
    // ids are dense 1..k per user — a running sum can't skip
    val gaps = sessions.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("k"))
      .filter(col("mx") =!= col("k")).count()
    assert(gaps == 0, "session ids must be dense per user")
    sessions.unpersist()
  }

  test("histogram bins partition the rows (q97)") {
    val h = StatsOps.q97_histogram.run(spark, dir).cache()
    assert(h.agg(sum("n")).head.getLong(0) == Tables.load(spark, dir, "lineitem").count())
    assert(h.filter(col("bin") < 0 || col("bin") > 19).count() == 0)
    h.unpersist()
  }

  test("pagerank mass stays within teleport floor and total (q99)") {
    val r = GraphOps.q99_pagerank.run(spark, dir).cache()
    assert(r.count() == 25, "every nation keeps a rank row")
    assert(r.filter(col("pr_fp") < 6000000000L).count() == 0,
      "teleport term is a hard floor per node")
    val mass = r.agg(sum("pr_fp")).head.getLong(0)
    // fixed-point flooring only ever loses mass vs the exact 10^12
    assert(mass <= 1000000000000L && mass > 900000000000L,
      s"rank mass must stay ~conserved, got $mass")
    r.unpersist()
  }

  test("merge tags every surviving key exactly once (q101)") {
    val m = TemporalOps.q101_merge_upsert.run(spark, dir).cache()
    val users = Tables.load(spark, dir, "events").select("user_id").distinct().count()
    assert(m.count() == users, "one output row per user ever seen")
    assert(m.select("op").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("insert", "update", "keep")))
    m.unpersist()
  }

  test("interpolation preserves observed points and only fills interior gaps (q102)") {
    val out = TemporalOps.q102_interpolate.run(spark, dir).cache()
    assert(out.filter(col("kind") === "observed" && col("amount").isNull).count() == 0)
    assert(out.filter(col("kind") === "edge" && col("amount").isNotNull).count() == 0)
    assert(out.filter(col("kind") === "interpolated").count() > 0,
      "fixture has gaps to fill")
    out.unpersist()
  }

  test("BPE merge candidates are 2-grams weighted by corpus frequency (q100)") {
    val p = TextOps.q100_bpe_merge.run(spark, dir).cache()
    assert(p.count() == 20)
    assert(p.filter(length(col("pair")) =!= 2).count() == 0,
      "adjacent char pairs only — the trailing-empty-split artifact must not leak")
    p.unpersist()
  }

  test("BPE encode covers every non-space char exactly once (q193)") {
    val e = TextOps.q193_bpe_encode.run(spark, dir).cache()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nsp"))
    // Conservation law of greedy longest-match: a merged token covers 2
    // chars, a single covers 1, so n_tok + n_merged == non-space chars.
    // This catches a skip/advance bug even if the oracle is rewritten
    // in lockstep with the query.
    val broken = e.join(docs, "doc_id")
      .filter(col("n_tok") + col("n_merged") =!= col("nsp")).count()
    assert(broken == 0, s"$broken docs violate n_tok + n_merged == non-space chars")
    // ids are 1-based vocab positions: the checksum can never undercut
    // the token count, and merges can't outnumber tokens.
    assert(e.filter(col("id_sum") < col("n_tok")).count() == 0)
    assert(e.filter(col("n_merged") > col("n_tok")).count() == 0)
    e.unpersist()
  }

  test("chi-square cells partition the events; contributions are non-negative (q110)") {
    val c = StatsOps.q110_chi_square.run(spark, dir).cache()
    assert(c.agg(sum("o")).head.getLong(0) == Tables.load(spark, dir, "events").count())
    assert(c.filter(col("chi_fp") < 0).count() == 0)
    c.unpersist()
  }

  test("KS statistic is a valid probability distance (q107)") {
    val k = StatsOps.q107_ks_test.run(spark, dir).head()
    val (n1, n2, num) = (k.getLong(0), k.getLong(1), k.getLong(2))
    assert(num >= 0 && num <= n1 * n2, "0 <= KS <= 1 in integer form")
  }

  test("2-hop weights dominate any single path; sources come from the edge set (q109)") {
    val h = GraphOps.q109_graph_2hop.run(spark, dir).cache()
    assert(h.count() > 0)
    assert(h.filter(col("n_2hop") < 1 || col("n_2hop") > 25).count() == 0,
      "2-hop fan-out is bounded by the node count")
    h.unpersist()
  }

  test("EMA terms exclude incomplete history (q108)") {
    val e = TemporalOps.q108_ema_lags.run(spark, dir)
    val perUser = e.groupBy("user_id").count()
    val events = Tables.load(spark, dir, "events")
      .groupBy("user_id").count().withColumnRenamed("count", "n_ev")
    // each user loses exactly the 7 warm-up rows (users with <8 events vanish)
    val bad = perUser.join(events, "user_id")
      .filter(col("count") =!= col("n_ev") - 7).count()
    assert(bad == 0)
  }

  test("centroid outliers: at most 5 per label, ranked by distance (q104)") {
    val o = VectorOps.q104_centroid_outliers.run(spark, dir).cache()
    assert(o.groupBy("label").count().filter(col("count") > 5).count() == 0)
    assert(o.filter(col("rn") < 1 || col("rn") > 5).count() == 0)
    o.unpersist()
  }
}
