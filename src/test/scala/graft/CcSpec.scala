package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Star-contraction connected components (q202's operator and q68's
  * distributed branch) against an in-process union-find reference:
  * identical min-id labels on adversarial shapes (long paths — the
  * O(diameter) killer for min-label propagation — random graphs,
  * pre-contracted stars, dirty inputs with self-loops/duplicates), and
  * the round count on a path stays LOGARITHMIC in its length, which is
  * the entire reason the operator exists. */
class CcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cc-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("a", "b")
  }

  private def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      if (a != b) {
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  private def ccLabels(es: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val (df, rounds) = GraphOps.connectedComponentsWithRounds(edgesDf(es))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("path graph: labels match union-find and rounds stay logarithmic in the diameter") {
    val n = 512
    val path = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val (labels, rounds) = ccLabels(path)
    assert(labels == unionFind(path))
    assert(labels.values.toSet == Set(0L), "one component rooted at the minimum")
    // min-label propagation would need ~n rounds on this graph; star
    // contraction is O(log² n) in theory and ~2·log₂ n in practice.
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 4
    assert(rounds <= bound, s"path-$n took $rounds rounds (bound $bound)")
  }

  test("random graphs match union-find across seeds") {
    for (seed <- Seq(1, 7, 13)) {
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(230)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
        .filter { case (a, b) => a != b }
      val (labels, _) = ccLabels(es)
      assert(labels == unionFind(es), s"seed $seed diverged from union-find")
    }
  }

  test("an already-contracted star converges immediately; dirty input (self-loops, duplicates, both orientations) labels like the clean graph") {
    val star = (1L to 40L).map(v => (0L, v))
    val (sl, sr) = ccLabels(star)
    assert(sl == unionFind(star))
    assert(sr <= 2, s"star took $sr rounds")

    val clean = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val dirty = clean ++ Seq((2L, 1L), (1L, 1L), (1L, 2L), (3L, 2L), (11L, 11L))
    assert(ccLabels(dirty)._1 == unionFind(clean))
  }

  test("empty edge set yields empty labels") {
    assert(ccLabels(Seq.empty)._1.isEmpty)
  }

  test("DriverCc primitive union-find matches the boxed reference on random graphs") {
    import graft.operators.DedupOps
    for (seed <- Seq(2, 11, 29, 47)) {
      val rnd = new scala.util.Random(seed)
      // ids drawn sparse (×1e9 stride) so the open-addressing table sees
      // realistic 63-bit keys, not dense smalls; duplicates kept — the
      // edge list is allowed to repeat pairs
      val es = Seq.fill(300)((rnd.nextInt(150).toLong * 1000000007L,
        rnd.nextInt(150).toLong * 1000000007L)).filter { case (a, b) => a != b }
      val (ids, labels) = DedupOps.DriverCc.label(
        es.map(_._1).toArray, es.map(_._2).toArray)
      assert(ids.length == ids.distinct.length, s"seed $seed: duplicate node ids")
      val got = ids.zip(labels).toMap
      assert(got == unionFind(es), s"seed $seed diverged from reference union-find")
    }
    // empty edge list
    val (i0, l0) = DedupOps.DriverCc.label(Array.empty[Long], Array.empty[Long])
    assert(i0.isEmpty && l0.isEmpty)
  }

  test("q68's distributed branch (forced) labels the fixture dup graph exactly like the union-find branch") {
    import graft.operators.DedupOps
    val sfDir = "/root/testdata/sf0.001"
    val pairs = DedupOps.fixturePairs(spark, sfDir)
    def rows(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaUnionFind = rows(DedupOps.clusterLabels(spark, pairs))
    val viaContraction = rows(DedupOps.clusterLabels(spark, pairs, smallGraphEdges = 0L))
    assert(viaContraction == viaUnionFind,
      "the >5M-edge star-contraction branch diverged from the in-process union-find")
    assert(viaUnionFind.nonEmpty, "fixture dup graph unexpectedly empty")
  }
}
