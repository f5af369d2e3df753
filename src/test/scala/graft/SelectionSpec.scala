package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GlobalRank, SelectionOps}

/** Brute-force references for the SelectionOps family: the operators'
  * distributed formulations (cell-partitioned pairwise, inverted-index
  * window join + islands) must equal a direct single-threaded
  * computation of the same definitions on the sf0.001 fixture — the
  * IncrementalDedupSpec style of pinning a formulation, independent of
  * the DuckDB oracle (which pins cross-engine value identity).
  */
class SelectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-selection-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ---- shared devices (must match SelectionOps bit-for-bit) -----------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def centroid(c: Int): Array[Float] = (0 until 64).map { j =>
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${200 + c}_$j".getBytes("UTF-8"))
    (((hex(0) >> 4) & 0xf) - 7.5).toFloat
  }.toArray

  /** Left-to-right float→double fold — DotProductFF's accumulation. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("cellCount derivation: √N/4 at fixture scales, occupancy-bounded beyond") {
    assert(SelectionOps.cellCount(1) == 4)
    assert(SelectionOps.cellCount(500) == 4)      // sf0.01 — unchanged
    assert(SelectionOps.cellCount(2000) == 8)     // sf0.1 — unchanged
    assert(SelectionOps.cellCount(5000) == 16)
    assert(SelectionOps.cellCount(20000) == 32)   // sf1 rehearsal — unchanged
    // above N = 16384 the occupancy-bounded regime (k = N/512-ish)
    // takes over: the round-8 100× rehearsal measured the √N rule's
    // N^1.5 within-cell pass at 200 s warm
    assert(SelectionOps.cellCount(50000) == 64)
    assert(SelectionOps.cellCount(200000) == 256) // sf10 rehearsal: occ ~780
    assert(SelectionOps.cellCount(1L << 40) == 1024)
  }

  test("q181 equals the brute-force SemDeDup rule on sf0.001") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val k = SelectionOps.cellCount(vecs.length.toLong)
    val cents = (0 until k).map(centroid)

    // assignment: first-max argmax
    val asg = vecs.map { case (id, v) =>
      val ds = cents.map(c => dot(c, v))
      val mx = ds.max
      (id, ds.indexWhere(_ == mx).toLong, v)
    }

    // centroid means + priority, in the operator's fixed-point terms
    val byCluster = asg.groupBy(_._2)
    val cval: Map[(Long, Int), Double] = byCluster.flatMap { case (cl, ms) =>
      (0 until 64).map { d =>
        val sfp = ms.map(m => math.floor(m._3(d).toDouble * 1e10).toLong).sum
        (cl, d) -> sfp.toDouble / (ms.length.toDouble * 1e10)
      }
    }
    val nclFp: Map[Long, Long] = byCluster.map { case (cl, _) =>
      cl -> (0 until 64).map(d => math.floor(cval((cl, d)) * cval((cl, d)) * 1e9).toLong).sum
    }
    val csimFp: Map[Long, Long] = asg.map { case (id, cl, v) =>
      val dvc = (0 until 64).map(d => math.floor(v(d).toDouble * cval((cl, d)) * 1e9).toLong).sum
      val nv = (0 until 64).map(d => math.floor(v(d).toDouble * v(d).toDouble * 1e9).toLong).sum
      id -> math.floor(dvc.toDouble / (math.sqrt(nv.toDouble) * math.sqrt(nclFp(cl).toDouble)) * 1e9).toLong
    }.toMap

    // within-cell pairs, keep-the-atypical losers
    val losers = scala.collection.mutable.Set[Long]()
    for {
      (_, ms) <- byCluster
      i <- ms.indices; j <- (i + 1) until ms.length
    } {
      val (a, b) = if (ms(i)._1 < ms(j)._1) (ms(i), ms(j)) else (ms(j), ms(i))
      val cos = dot(a._3, b._3) / (math.sqrt(dot(a._3, a._3)) * math.sqrt(dot(b._3, b._3)))
      if (cos >= 0.45) {
        val (ca, cb) = (csimFp(a._1), csimFp(b._1))
        losers += (if (ca < cb || (ca == cb && a._1 < b._1)) b._1 else a._1)
      }
    }

    val got = SelectionOps.q181_semantic_dedup.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size == vecs.length)
    asg.foreach { case (id, cl, _) =>
      val (gcl, gcs, gdup) = got(id)
      assert(gcl == cl, s"cluster mismatch for $id")
      assert(gcs == csimFp(id), s"csim_fp mismatch for $id")
      assert(gdup == losers.contains(id), s"is_dup mismatch for $id")
    }
    assert(losers.nonEmpty, "fixture should contain semantic dups")
    assert(losers.size < vecs.length / 2, "dup rule should not mark most of the corpus")
  }

  test("q195 equals the brute-force multi-probe rule; primary probe matches q181; " +
    "its dup set contains q181's") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val k = SelectionOps.cellCount(vecs.length.toLong)
    val cents = (0 until k).map(centroid)

    // top-2 assignment: first-max argmax, then first-max over the rest
    // (next occurrence on d-ties — the operator's nc-exclusion rule)
    val asg2 = vecs.map { case (id, v) =>
      val ds = cents.map(c => dot(c, v))
      val p1 = ds.indexWhere(_ == ds.max)
      val rest = ds.zipWithIndex.filter(_._2 != p1)
      val m2 = rest.map(_._1).max
      val p2 = rest.find(_._1 == m2).get._2
      (id, p1.toLong, p2.toLong, v)
    }
    val probesOf = asg2.map(a => a._1 -> Set(a._2, a._3)).toMap

    // multi-probe candidate pairs: any shared probed cell
    val byId = asg2.map(a => a._1 -> a._4).toMap
    val ids = asg2.map(_._1)
    val q181Rows = SelectionOps.q181_semantic_dedup.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val csimFp = q181Rows.map(r => r._1 -> r._3).toMap // shared prioTable
    val losers = scala.collection.mutable.Set[Long]()
    for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if probesOf(a).intersect(probesOf(b)).nonEmpty
    } {
      val (va, vb) = (byId(a), byId(b))
      val cos = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      if (cos >= 0.45) {
        val (ca, cb) = (csimFp(a), csimFp(b))
        losers += (if (ca < cb || (ca == cb && a < b)) b else a)
      }
    }

    val got = SelectionOps.q195_semantic_dedup_multiprobe.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.size == vecs.length)
    val q181Cluster = q181Rows.map(r => r._1 -> r._2).toMap
    val q181Dups = q181Rows.filter(_._4).map(_._1).toSet
    asg2.foreach { case (id, p1, p2, _) =>
      val (gc1, gc2, gcs, gdup) = got(id)
      assert(gc1 == p1 && gc2 == p2, s"top-2 mismatch for $id: got ($gc1,$gc2) want ($p1,$p2)")
      assert(gc1 == q181Cluster(id), s"primary probe must equal q181's cell for $id")
      assert(gcs == csimFp(id), s"q195 must rank by the shared priority table ($id)")
      assert(gdup == losers.contains(id), s"multi-probe is_dup mismatch for $id")
    }
    // the multi-probe candidate set contains every within-cell pair, so
    // its dup set can only grow
    assert(q181Dups.subsetOf(got.filter(_._2._4).keySet),
      "q195's dup set must contain q181's")
  }

  test("topPAssignment generalizes q195's top-2 and is monotone in p") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val k = SelectionOps.cellCount(n)
    // p = 2 reproduces the oracle-checked operator's (c1, c2) exactly
    val want = SelectionOps.q195_semantic_dedup_multiprobe.run(spark, sfDir)
      .select("vec_id", "c1", "c2").collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2))).toMap
    val got2 = SelectionOps.topPAssignment(e, k, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got2 == want, "topPAssignment(p=2) diverged from q195's top-2")
    // probe sets are distinct cells, nested by p, of size min(p, k)
    val got1 = SelectionOps.topPAssignment(e, k, 1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got4 = SelectionOps.topPAssignment(e, k, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    got4.foreach { case (id, cells) =>
      assert(cells.size == math.min(4, k) && cells.distinct == cells,
        s"probe set malformed for $id")
      assert(cells.take(1) == got1(id) && cells.take(2) == got2(id),
        s"probe sets must be nested in p for $id")
    }
  }

  test("q182 equals the brute-force window/island computation on sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val words = docs.map { case (id, tx) => (id, tx.split(" ", -1)) }

    // corpus-global duplicated 8-token window keys
    val winCount = scala.collection.mutable.Map[String, Int]()
    val docWins = words.map { case (id, ws) =>
      val wins = (0 to ws.length - 8).map(p => (p, ws.slice(p, p + 8).mkString(" ")))
      wins.foreach { case (_, g) => winCount(g) = winCount.getOrElse(g, 0) + 1 }
      (id, ws, wins)
    }

    val expected = docWins.map { case (id, ws, wins) =>
      val dupStarts = wins.collect { case (p, g) if winCount(g) >= 2 => p }
      // merge overlapping [p, p+8) into maximal spans
      val spans = dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) => acc match {
          case (s0, e0) :: rest if p <= e0 => (s0, math.max(e0, p + 8)) :: rest
          case _ => (p, p + 8) :: acc
        }
      }.reverse
      val dupTok = spans.map { case (s0, e0) => e0 - s0 }.sum.toLong
      val covered = Array.fill(ws.length)(false)
      spans.foreach { case (s0, e0) => (s0 until e0).foreach(covered(_) = true) }
      val cleaned = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }.mkString(" ")
      id -> ((ws.length.toLong, spans.length.toLong, dupTok,
        math.floor(dupTok.toDouble * 1000000.0 / ws.length).toLong, md5hex(cleaned)))
    }.toMap

    val got = SelectionOps.q182_dup_spans.run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got.size == docs.length)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: got ${got(id)} expected $exp")
    }
    assert(expected.values.exists(_._3 > 0), "fixture should contain duplicated spans")
    assert(expected.values.exists(_._3 == 0), "fixture should contain clean docs")
  }

  test("GlobalRank: decomposed ranks equal the single-partition truth; " +
    "windows stay partitioned by the range-partition id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // keys with heavy ties and skew — the case where splitting a key
    // across range partitions would corrupt both devices
    val rows = (0 until 5000).map(i => ((i * 7919) % 23, (i * 104729) % 5, i))
    val df = rows.toDF("k1", "k2", "id")
    val ranked = GlobalRank.orderRank(df, Seq(col("k1"), col("k2")), "r")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(3)))
    // order/equality-faithful: same key -> same rank, key order -> rank order
    val byKey = ranked.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }
    assert(byKey.values.forall(_.size == 1), "equal keys must get equal ranks")
    val sortedKeys = byKey.keys.toSeq.sorted
    val rankOf = byKey.map { case (k, vs) => k -> vs.head }
    sortedKeys.sliding(2).foreach {
      case Seq(a, b) => assert(rankOf(a) < rankOf(b), s"rank order broken at $a -> $b")
      case _ =>
    }
    val rn = GlobalRank.rowNumber(df, Seq(col("k1"), col("k2"), col("id")), "rn")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val expectedRn = rows.sorted.zipWithIndex.map { case ((a, b, c), i) => (a, b, c, i + 1L) }
    assert(rn.sortBy(_._4).toSeq == expectedRn, "rowNumber must be the exact global 1..N")
    // the plan must rank inside range partitions, never one global window
    val p = GlobalRank.orderRank(df, Seq(col("k1"), col("k2")), "r")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).mkString
    assert(specs.contains("__pid"), s"window must be partitioned by __pid:\n$specs")
  }

  test("GlobalRank.derivedParts: conf floor at gate scale, corpus-derived beyond, capped") {
    val t = GlobalRank.TargetRowsPerPartition
    // gate scale: the conf floor wins — plans (and hashes) unchanged
    assert(GlobalRank.derivedParts(32, 0L) == 32)
    assert(GlobalRank.derivedParts(32, 4L * 1000 * 1000) == 32)
    assert(GlobalRank.derivedParts(32, 32L * t) == 32)
    // beyond the floor: ceil(rows / target), monotone in rows
    assert(GlobalRank.derivedParts(32, 33L * t) == 33)
    assert(GlobalRank.derivedParts(32, 33L * t - 1) == 33)
    assert(GlobalRank.derivedParts(32, 300L * t + 1) == 301)
    // the 100×-rehearsal scale that OOM'd at conf=32 derives ≥128
    assert(GlobalRank.derivedParts(32, 600L * 1000 * 1000) >= 128)
    // bounded above: a runaway row count cannot explode the task count
    assert(GlobalRank.derivedParts(32, Long.MaxValue / 4) == 20000)
    val rows = (1L to 50).map(_ * t / 3)
    assert(rows.map(GlobalRank.derivedParts(32, _)) == rows.map(GlobalRank.derivedParts(32, _)).sorted)
  }

  test("q186/q187: the prefix-doubling SA equals a direct bounded-suffix sort " +
    "on sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // direct construction: sort all (doc, pos) by 64-bounded suffix
    val sfx = docs.flatMap { case (id, tx) =>
      (0 until tx.length).map(p => (tx.substring(p, math.min(p + 64, tx.length)), id, p.toLong))
    }
    val sa = sfx.sortBy(x => (x._1, x._2, x._3)).zipWithIndex
      .map { case ((pfx, id, p), i) => (i + 1L, id, p, pfx) }
    val expectSample = sa.filter(_._1 % 97 == 1)
      .map { case (sp, id, p, pfx) => (sp, id, p, pfx.take(16)) }
    val got = SelectionOps.q186_suffix_array.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == expectSample.toSeq,
      s"sampled SA mismatch: got ${got.take(3).mkString(",")} expected ${expectSample.take(3).mkString(",")}")

    // q187 from the direct SA: adjacent cross-doc LCPs, per-doc max + n_pos30
    def lcp(a: String, b: String): Long = {
      var i = 0
      while (i < math.min(a.length, b.length) && a(i) == b(i)) i += 1
      i.toLong
    }
    val asg = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    sa.sliding(2).foreach {
      case Array((_, ida, pa, fa), (_, idb, pb, fb)) if ida != idb =>
        val l = lcp(fa, fb)
        asg += ((ida, pa, l)); asg += ((idb, pb, l))
      case _ =>
    }
    val exp = asg.groupBy(_._1).map { case (id, vs) =>
      id -> ((vs.map(_._3).max, vs.filter(_._3 >= 30).map(_._2).distinct.size.toLong))
    }
    val got187 = SelectionOps.q187_sa_dup_lengths.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got187.size == docs.length)
    docs.foreach { case (id, _) =>
      assert(got187(id) == exp.getOrElse(id, (0L, 0L)), s"doc $id mismatch")
    }
    assert(exp.values.exists(_._1 >= 30), "fixture should contain long cross-doc matches")
  }

  test("q188 equals the brute-force composed pipeline, and its substring gate " +
    "runs on the SURVIVOR corpus (stage outputs chain)") {
    import graft.operators.DedupOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val clusters = DedupOps.q68_dedup_clusters.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // stage 1: survivorship
    val surv = docs.filter { case (id, _, _, _) =>
      clusters.get(id).forall(_ == id)
    }
    assert(surv.length < docs.length, "survivorship must drop members")
    // stage 2: window recount among survivors only
    def dupFrac(corpus: Array[(Long, String)]): Map[Long, (Long, Long)] = {
      val winCount = scala.collection.mutable.Map[String, Int]()
      val perDoc = corpus.map { case (id, tx) =>
        val ws = tx.split(" ", -1)
        val wins = (0 to ws.length - 8).map(p => (p, ws.slice(p, p + 8).mkString(" ")))
        wins.foreach { case (_, g) => winCount(g) = winCount.getOrElse(g, 0) + 1 }
        (id, ws.length.toLong, wins)
      }
      perDoc.map { case (id, n, wins) =>
        val dupStarts = wins.collect { case (p, g) if winCount(g) >= 2 => p }
        val spans = dupStarts.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, p) if p <= e0 => (s0, math.max(e0, p + 8)) :: rest
          case (acc, p) => (p, p + 8) :: acc
        }
        id -> ((n, spans.map { case (s0, e0) => (e0 - s0).toLong }.sum))
      }.toMap
    }
    val rawFrac = dupFrac(docs.map(d => (d._1, d._4)))
    val survFrac = dupFrac(surv.map(d => (d._1, d._4)))
    def fails(m: Map[Long, (Long, Long)], id: Long): Boolean = {
      val (n, dup) = m(id)
      math.floor(dup.toDouble * 1000000.0 / n).toLong >= 500000
    }
    val rawFails = surv.count(d => fails(rawFrac, d._1))
    val survFails = surv.count(d => fails(survFrac, d._1))
    assert(rawFails > survFails,
      "the recount must differ from the raw-corpus gate — otherwise stage 2 " +
        s"isn't consuming stage 1's output (raw=$rawFails surv=$survFails)")
    // stages 3-4: split + census with mean DSIR weight from the operator's
    // own importance surface (q183's logw is oracle-pinned separately)
    val kept = surv.filter(d => !fails(survFrac, d._1))
    def split(key: Long): String = {
      val b = Integer.parseInt(md5hex(key.toString).substring(0, 2), 16)
      if (b < 205) "train" else if (b < 230) "val" else "test"
    }
    val expCensus = kept.groupBy(d => (split(clusters.getOrElse(d._1, d._1)), d._2))
      .map { case (k, ds) => k -> ((ds.length.toLong, ds.map(_._3).sum)) }
    val got = SelectionOps.q188_selection_pipeline.run(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expCensus.keySet)
    expCensus.foreach { case (k, v) => assert(got(k) == v, s"census mismatch at $k") }
  }

  test("q184: doc-keyed split leaks near-dup clusters; cluster-keyed split cannot") {
    import graft.operators.DedupOps
    val clusters = DedupOps.q68_dedup_clusters.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty, "fixture should have near-dup clusters")
    def split(key: Long): String = {
      val h = md5hex(key.toString)
      val bucket = Integer.parseInt(h.substring(0, 2), 16)
      if (bucket < 205) "train" else if (bucket < 230) "val" else "test"
    }
    // q65's doc-keyed rule: at least one multi-doc cluster straddles
    // splits on this fixture — the leakage q184 exists to prevent
    val leaky = clusters.groupBy(_._2).values
      .exists(ms => ms.length >= 2 && ms.map(m => split(m._1)).distinct.length > 1)
    assert(leaky, "fixture's clusters should demonstrate doc-keyed leakage")
    // cluster-keyed: by construction every member shares split(cluster_id)
    val byCluster = clusters.groupBy(_._2).values
    byCluster.foreach { ms =>
      assert(ms.map(m => split(m._2)).distinct.length == 1)
    }
    // census consistency against the operator output
    val out = SelectionOps.q184_cluster_safe_split.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.map(_._2).sum == nDocs, "splits must partition the corpus")
    assert(out.map(_._4).sum == clusters.length.toLong,
      "clustered-doc census must equal the cluster table size")
  }
}
