package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SketchOps

/** Semantic properties of the mergeable sketches (SketchOps) — the
  * cross-engine value identity is the DuckDB gate's job; this spec pins
  * the properties the sketches CLAIM:
  *  - CMS is one-sided (est ≥ exact, always) and mergeable (partial
  *    sketches from disjoint corpus halves sum to the full sketch);
  *  - the KMV estimator is EXACT in the unsaturated regime (every
  *    sketch < k values ⇒ inclusion–exclusion reproduces the true
  *    intersection), proven on a synthetic corpus built to sit in that
  *    regime;
  *  - on the real fixture the KMV intersection error stays inside a
  *    fixture-derived band (measured, then pinned — the BloomSkipSpec
  *    convention).
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sketch-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("q197: CMS estimate never undercounts, and top-200 eval is total") {
    val rows = SketchOps.q197_cms_error_eval.run(spark, sfDir).collect()
    // Shingle vocabulary at sf0.001 is ≫200 (measured 1.1k–1.5k per
    // source), so the top-200 probe set is full.
    assert(rows.length == 200)
    rows.foreach { r =>
      val exact = r.getAs[Long]("c_exact")
      val est = r.getAs[Long]("c_est")
      assert(est >= exact, s"CMS undercounted ${r.getAs[String]("w")}: $est < $exact")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("q197: partial sketches from disjoint halves merge to the full sketch") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      SketchOps.cmsOf(SketchOps.shingleStreamOf(df).select("w"))
    val full = sketchOf(docs).collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val lo = sketchOf(docs.filter(col("doc_id") % 2 === 0))
    val hi = sketchOf(docs.filter(col("doc_id") % 2 === 1))
    val merged = lo.union(hi).groupBy("row", "bucket").agg(sum("cnt").cast("long").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == full, "summed half-corpus sketches != full-corpus sketch")
  }

  test("q197: the histogram-derived sketch is bit-identical to the one-pass sketch") {
    // round-14 optimization contract: q197's eval derives the sketch
    // from the exact vocab histogram (cmsOfCounts) instead of a second
    // occurrence pass (cmsOf) — the two must agree on every bucket.
    import org.apache.spark.sql.functions._
    val words = SketchOps.shingleStreamOf(
      graft.sources.Tables.load(spark, sfDir, "documents")).select("w")
    val onePass = SketchOps.cmsOf(words)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hist = words.groupBy("w").agg(count(lit(1)).cast("long").as("c"))
    val derived = SketchOps.cmsOfCounts(hist)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(derived == onePass, "cmsOfCounts(histogram) != cmsOf(occurrences)")
  }

  test("q198: unsaturated KMV sketches give the EXACT intersection") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv").toString
    // Three sources, shingle sets well under k=256, with known 3-gram
    // overlaps: srcA = t0..t29, srcB = t10..t59 share the 18 shingles
    // "t10 t11 t12".."t27 t28 t29"; srcA, srcC share the 8 shingles
    // "t0 t1 t2".."t7 t8 t9"; srcB ∩ srcC = {} — every sketch is the
    // full set, so inclusion–exclusion must equal the exact join.
    val mk = (ts: Seq[Int]) => ts.map(i => s"t$i").mkString(" ")
    Seq(
      (1L, mk(0 until 30), "xx", "srcA", 1L),
      (2L, mk(10 until 60), "xx", "srcB", 1L),
      (3L, mk((0 until 10) ++ (100 until 140)), "xx", "srcC", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SketchOps.q198_kmv_theta_sketch.run(spark, dir).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")) ->
        (r.getAs[Long]("est_inter_fp"), r.getAs[Long]("n_exact"), r.getAs[Long]("abs_err_fp"))).toMap
    assert(out.keySet == Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    assert(out(("srcA", "srcB")) == ((18000000L, 18L, 0L)))
    assert(out(("srcA", "srcC")) == ((8000000L, 8L, 0L)))
    assert(out(("srcB", "srcC")) == ((0L, 0L, 0L)))
  }

  test("q199: quantile estimates land inside the 3σ band and the eval is total") {
    val rows = SketchOps.q199_quantile_sketch_eval.run(spark, sfDir).collect()
    // 3 return flags × 4 percentiles, every group saturated (≥1.4k
    // lineitem rows per flag at sf0.001 vs k=512)
    assert(rows.length == 12)
    rows.foreach { r =>
      val est = r.getAs[Long]("v_est")
      val exact = r.getAs[Long]("v_exact")
      assert(r.getAs[Long]("abs_err") == math.abs(est - exact))
      // Fixture-derived pin (BloomSkipSpec convention): a p-quantile
      // from a k=512 uniform sample has rank error σ = √(p(1−p)/512)·n
      // ≤ 2.21%·n; prices are ~uniform over a 10.4e6-cent range, so 3σ
      // of value ≈ 0.066 · 10.4e6 ≈ 6.9e5 at the worst case p50.
      // Measured max |err| = 290_694 (sf0.001) / 431_375 (sf0.1).
      assert(math.abs(est - exact) <= 700000L,
        s"${r.getAs[String]("rf")}/p${r.getAs[Int]("p")}: est=$est exact=$exact")
    }
  }

  test("q199: half-corpus sketches re-minimize to the full-corpus sketch") {
    import org.apache.spark.sql.functions._
    val li = SketchOps.qsPriceRows(
      graft.sources.Tables.load(spark, sfDir, "lineitem"))
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(identity).toSeq
    val full = rowsOf(SketchOps.qsTopK(li))
    // every flag group is saturated, so the merge genuinely evicts:
    // both halves contribute > k/2 candidate rows per group
    val merged = rowsOf(SketchOps.qsMerge(
      SketchOps.qsTopK(li.filter(col("h") % 2 === 0)),
      SketchOps.qsTopK(li.filter(col("h") % 2 === 1))))
    assert(merged == full,
      "re-minimized half-corpus quantile sketches != full-corpus sketch")
  }

  test("q199: the unsaturated sketch reproduces every quantile exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qnt").toString
    // 3 flags × 100 rows (< k=512): the sample IS the group, so the
    // rank-quantile read must equal the exact one bit-for-bit
    val rows = for (f <- Seq("A", "N", "R"); i <- 1 to 100) yield
      (i.toLong * 7 + f.hashCode.abs % 5, i % 7 + 1,
        (i * 3739 % 99991) + 901.0 / 100.0, f)
    rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SketchOps.q199_quantile_sketch_eval.run(spark, dir).collect()
    assert(out.length == 12)
    out.foreach { r =>
      assert(r.getAs[Long]("abs_err") == 0L,
        s"unsaturated sketch not exact at ${r.getAs[String]("rf")}/p${r.getAs[Int]("p")}")
      assert(r.getAs[Long]("v_est") == r.getAs[Long]("v_exact"))
    }
  }

  test("q200: no false negatives, and the measured FPR tracks the load prediction") {
    val rows = SketchOps.q200_bloom_filter_eval.run(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("fn_cnt") == 0L, "a Bloom filter can NEVER miss a member")
    assert(r.getAs[Long]("probes_neg") > 0L)
    val n = r.getAs[Long]("n_build")
    val m = r.getAs[Long]("m_bits")
    assert(m >= 8 * n && m < 16 * n || m == (1L << 24), s"derived m=$m out of band for n=$n")
    assert(r.getAs[Long]("ones") <= 4 * n)
    // Fixture-derived pin (BloomSkipSpec convention): the load-factor
    // prediction (ones/m)^4 is the expected FPR for a probe key with 4
    // independent positions; over the held-out probes the measurement
    // concentrates. Measured: sf0.001 pred 5698e-6 / fpr 5658e-6
    // (0.99× pred, 6,009 probes); sf0.01 pred 5637e-6 / fpr 4672e-6
    // (0.83×, 5,778 probes). The pin is [pred/3, 3·pred] — generous
    // against probe-count noise, tight against a broken hash (a
    // correlated-position bug inflates FPR by orders of magnitude).
    val pred = r.getAs[Long]("fpr_pred_fp")
    val fpr = r.getAs[Long]("fpr_fp")
    assert(fpr <= 3 * pred + 1, s"measured FPR $fpr ≫ predicted $pred")
    assert(fpr >= pred / 3 - 1, s"measured FPR $fpr ≪ predicted $pred")
  }

  test("q200: half-corpus filters OR to the full-corpus filter, idempotently") {
    import org.apache.spark.sql.functions._
    val sh = SketchOps.shingleStreamOf(
      graft.sources.Tables.load(spark, sfDir, "documents"))
      .select("w").distinct()
    val m = 1L << 14
    def words(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = words(SketchOps.bloomOf(sh, m))
    val lo = SketchOps.bloomOf(sh.filter(length(col("w")) % 2 === 0), m)
    val hi = SketchOps.bloomOf(sh.filter(length(col("w")) % 2 === 1), m)
    val merged = words(SketchOps.bloomMerge(lo, hi))
    assert(merged == full, "OR of half-corpus filters != full-corpus filter")
    // idempotence: re-folding a half changes nothing (the replay law
    // SketchStream leans on)
    val again = words(SketchOps.bloomMerge(SketchOps.bloomMerge(lo, hi), lo))
    assert(again == full, "re-folding a half changed the bits")
  }

  test("q201: MG never overcounts, the undercount honors the (N−M)/(k+1) bound, and the sketch is informative") {
    val rows = SketchOps.q201_mg_heavy_hitters.run(spark, sfDir).collect()
    assert(rows.length == 20)
    val bound = rows.head.getAs[Long]("mg_bound")
    rows.foreach { r =>
      val exact = r.getAs[Long]("c_exact")
      val est = r.getAs[Long]("c_est")
      assert(est <= exact, s"MG overcounted ${r.getAs[String]("w")}: $est > $exact")
      assert(r.getAs[Long]("undercount") == exact - est)
      assert(exact - est <= bound,
        s"${r.getAs[String]("w")}: undercount ${exact - est} breaks the MG bound $bound")
    }
    // the sketch must actually SURVIVE the fixture's deductions — an
    // all-zero estimate column would be a vacuous (mis-sized) sketch
    assert(rows.count(_.getAs[Long]("c_est") > 0) >= 10,
      "MG estimates all zeroed — k is mis-sized for the fixture stream")
  }

  test("q201: the map-only level 0 is bit-identical to the groupBy/window reduction") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(identity).toSeq
    val mapOnly = rows(SketchOps.mgLevel0Of(docs))
    val viaShuffle = rows(SketchOps.mgReduce(
      SketchOps.mgStreamOf(docs).groupBy(col("doc_id").as("gid"), col("w"))
        .agg(count(lit(1)).cast("long").as("c"))))
    assert(mapOnly == viaShuffle,
      "array-expression level 0 diverged from the shuffle-based reduction")
  }

  test("q201: the merge law survives ARBITRARY merge trees, not just the canonical one") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val occ = SketchOps.mgStreamOf(docs).cache()
    val exact = occ.groupBy("w").agg(count(lit(1)).cast("long").as("c_exact"))
    val n = occ.count()
    for (seed <- Seq(3, 17)) {
      // scatter docs over 16 arbitrary groups (a random 4-level merge
      // tree — what a production pipeline's arrival order produces),
      // then fold with the engine's own reduce/merge rounds
      val lvl0 = SketchOps.mgReduce(
        occ.withColumn("gid", pmod(xxhash64(col("doc_id"), lit(seed)), lit(16L)))
          .groupBy("gid", "w").agg(count(lit(1)).cast("long").as("c")))
      var st = lvl0
      (1 to 4).foreach(_ => st = SketchOps.mgMergeRound(st))
      val m = st.agg(coalesce(sum("c"), lit(0L))).collect().head.getLong(0)
      val bound = (n - m) / 65L
      val joined = exact.join(st.select(col("w"), col("c").as("c_est")), Seq("w"), "left")
        .select(col("w"), col("c_exact"), coalesce(col("c_est"), lit(0L)).as("c_est"))
        .collect()
      joined.foreach { r =>
        val (ex, es) = (r.getLong(1), r.getLong(2))
        assert(es <= ex, s"seed $seed: MG overcounted ${r.getString(0)}")
        assert(ex - es <= bound,
          s"seed $seed: ${r.getString(0)} undercount ${ex - es} > bound $bound")
      }
    }
  }

  test("q203: the weighted sample is the exact bottom-k of the replicated-hash keys, and halves merge to the full draw") {
    import org.apache.spark.sql.functions._
    import graft.operators.SelectionOps
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    // JVM-side reference: per doc, min over w MD5 replicas (60-bit
    // prefix), bottom-100 by (key, doc_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val ref = docs.select("doc_id", "source").collect().map { r =>
      val (id, src) = (r.getLong(0), r.getString(1))
      val hex = md.digest(src.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val w = 1 + Integer.parseInt(hex.substring(0, 1), 16) % 8
      val key = (0 until w).map(j => h60(s"$id:$j")).min
      (key, id, w.toLong)
    }.sortBy(t => (t._1, t._2)).take(100)
    val got = SelectionOps.q203_weighted_sample.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("hv_min"), r.getAs[Long]("doc_id"), r.getAs[Long]("w")))
    assert(got.toSeq == ref.toSeq, "engine draw != JVM reference draw")

    // mergeability: bottom-k of shard samples == bottom-k of the corpus
    val keys = SelectionOps.wsampleKeysOf(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("hv_min"), r.getAs[Long]("doc_id"))).sortBy(identity).toSeq
    val full = rows(keys.orderBy("hv_min", "doc_id").limit(100))
    val lo = keys.filter(col("doc_id") % 2 === 0).orderBy("hv_min", "doc_id").limit(100)
    val hi = keys.filter(col("doc_id") % 2 === 1).orderBy("hv_min", "doc_id").limit(100)
    assert(rows(SelectionOps.wsampleMerge(lo, hi)) == full,
      "re-minimized shard samples != full-corpus draw")
    // replay: folding a shard twice changes nothing (keys are pure
    // functions of the doc, so dedup absorbs the replay)
    assert(rows(SelectionOps.wsampleMerge(SelectionOps.wsampleMerge(lo, hi), lo)) == full)
  }

  test("q203: inclusion odds track the integer weights") {
    import spark.implicits._
    import graft.operators.SelectionOps
    val md = java.security.MessageDigest.getInstance("MD5")
    def tier(src: String): Int = {
      val hex = md.digest(src.getBytes("UTF-8")).map("%02x".format(_)).mkString
      1 + Integer.parseInt(hex.substring(0, 1), 16) % 8
    }
    // find one weight-8 and one weight-1 source name
    val s8 = (0 until 1000).map(i => s"heavy$i").find(tier(_) == 8).get
    val s1 = (0 until 1000).map(i => s"light$i").find(tier(_) == 1).get
    val docs = ((0L until 1000L).map(i => (i, s8)) ++
      (1000L until 2000L).map(i => (i, s1))).toDF("doc_id", "source")
    val sample = SelectionOps.wsampleKeysOf(docs)
      .orderBy("hv_min", "doc_id").limit(100).collect()
    val heavy = sample.count(_.getAs[Long]("w") == 8L)
    // E[heavy] = 100 · 8000/9000 ≈ 89; the draw is deterministic, so
    // this is a pinned measurement with a generous band against the
    // hypergeometric spread (σ ≈ 3.1)
    assert(heavy >= 75 && heavy <= 97,
      s"weight-8 docs drew $heavy of 100 (expected ≈89) — weights not honored")
  }

  test("q201: the exact histogram re-aggregated from per-doc histograms is " +
    "bit-identical to the direct occurrence count") {
    // round-14 wave-3 optimization contract: q201 derives the exact
    // vocab histogram from the checkpointed per-doc histogram s0
    // (Σ_doc per-doc counts) instead of a second corpus explode — the
    // two BIGINT aggregations must agree on every token.
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val occ = SketchOps.mgStreamOf(docs).cache()
    val direct = occ.groupBy("w").agg(count(lit(1)).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaS0 = occ.groupBy(col("doc_id").as("gid"), col("w"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy("w").agg(sum("c").cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    occ.unpersist()
    assert(viaS0 == direct,
      "per-doc-histogram re-aggregation diverged from the direct occurrence count")
  }

  test("q198: the 60-bit-hash-keyed exact intersection matches the " +
    "string-keyed intersection on the fixture") {
    // round-14 wave-3 optimization contract: the eval's exact
    // intersection self-joins the (source, hv) hash frame instead of
    // the (source, w) string frame — identical counts unless two of a
    // source's distinct shingles collide in 60 bits, which this pin
    // would catch on the fixture (the DuckDB oracle pins it at every
    // verify scale with strings).
    import org.apache.spark.sql.functions._
    val tok = SketchOps.shingleStreamOf(
      graft.sources.Tables.load(spark, sfDir, "documents")).distinct().cache()
    def inter(keyed: org.apache.spark.sql.DataFrame, k: String) =
      keyed.select(col("source").as("s1"), col(k))
        .join(keyed.select(col("source").as("s2"), col(k)), Seq(k))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val byString = inter(tok, "w")
    val byHash = inter(SketchOps.kmvHashes(tok), "hv")
    tok.unpersist()
    assert(byHash == byString,
      "hv-keyed intersection diverged from string-keyed intersection")
  }

  test("q198: fixture intersection error stays inside the measured band") {
    val rows = SketchOps.q198_kmv_theta_sketch.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_inter_fp")
      val exact = r.getAs[Long]("n_exact") * 1000000L
      assert(est >= 0L)
      // Fixture-derived pin (sf0.001, k=256, saturated — ~1.3k shingles
      // per source): KMV's per-sketch relative σ is ~1/√(k−2) ≈ 6.3%,
      // i.e. ~82 shingles absolute; inclusion–exclusion compounds three
      // estimates → σ ≈ 142, 3σ ≈ 425. Measured max |err| = 238, p99 =
      // 173 (fixed-point/1e6); the pin is the 3σ envelope.
      assert(math.abs(est - exact) <= 425L * 1000000L,
        s"${r.getAs[String]("s1")}/${r.getAs[String]("s2")}: est=$est exact=$exact")
    }
  }
}
