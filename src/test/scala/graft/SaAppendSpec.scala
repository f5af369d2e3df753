package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SelectionOps

/** Pins q194's load-bearing claim: merge-ranking a new batch's
  * suffixes against an existing suffix array ([[SelectionOps.saMerge]])
  * produces EXACTLY the array a full prefix-doubling rebuild
  * ([[SelectionOps.suffixArrayOf]]) would produce over the combined
  * corpus — for every way of cutting the corpus into (base, batch),
  * and for chained appends (batch₁ then batch₂), i.e. the index can be
  * maintained append-only forever without drifting from the rebuild.
  *
  * This is the q161/IncrementalDedupSpec equivalence applied to the SA:
  * the invariant that makes "append, never rebuild" a correct index
  * maintenance policy at 100 TB. The equality is exact on (sa_pos,
  * doc_id, pos) — canonical contiguous ranks, not just order — because
  * [[graft.operators.GlobalRank.rowNumber]] is partitioning-independent
  * and the doubling order IS bounded-prefix lexicographic order.
  *
  * Corpus: deterministic word salads with planted shared spans (so SA
  * neighborhoods interleave docs from both sides of every split) plus
  * edge shapes — a 1-char doc, a doc shorter than one doubling step,
  * two docs with identical text (rank ties broken only by doc_id).
  */
class SaAppendSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sa-append-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def salad(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 53}").mkString(" ")

  private lazy val corpus: Seq[(Long, String)] = {
    val shared = salad(9, 12)
    Seq(
      (1L, salad(1, 20)),
      (2L, salad(2, 25) + " " + shared),          // shares a span with 5
      (3L, "x"),                                  // 1-char doc
      (4L, salad(4, 3)),                          // shorter than a doubling step
      (5L, shared + " " + salad(5, 18)),
      (6L, salad(6, 22)),
      (7L, salad(6, 22)),                         // identical to 6: doc_id tie-break
      (8L, salad(8, 30)),
      (9L, shared)                                // the shared span verbatim
    )
  }

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def key(r: org.apache.spark.sql.Row): (Long, Long, Long) =
    (r.getLong(0), r.getLong(1), r.getLong(2))

  private def saRows(sa: DataFrame): Seq[(Long, Long, Long)] =
    sa.select(col("sa_pos"), col("doc_id"), col("pos"))
      .collect().map(key).sortBy(_._1).toSeq

  test("merge-append equals full rebuild for every batch split") {
    val full = saRows(SelectionOps.suffixArrayOf(df(corpus)))
    // every contiguous split point, including the degenerate ones
    // (empty base / empty batch)
    (0 to corpus.size).foreach { k =>
      val (baseRows, batchRows) = corpus.splitAt(k)
      val baseSA = SelectionOps.suffixArrayOf(df(baseRows))
      val merged = saRows(SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows)))
      assert(merged == full, s"split at $k diverged from the rebuild")
    }
  }

  test("chained appends stay equal to the rebuild (append-only forever)") {
    val full = saRows(SelectionOps.suffixArrayOf(df(corpus)))
    val (b0, rest) = corpus.splitAt(3)
    val (b1, b2) = rest.splitAt(3)
    val sa0 = SelectionOps.suffixArrayOf(df(b0))
    val sa1 = SelectionOps.saMerge(sa0, df(b0), df(b1))
      .select("sa_pos", "doc_id", "pos")
    val sa2 = saRows(SelectionOps.saMerge(sa1, df(b0 ++ b1), df(b2)))
    assert(sa2 == full, "two chained appends diverged from the rebuild")
  }

  test("the merge is stable: base suffixes keep their relative order") {
    val (baseRows, batchRows) = corpus.splitAt(5)
    val baseSA = SelectionOps.suffixArrayOf(df(baseRows))
    val merged = SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows))
    val old = merged.filter(col("is_new") === 0)
      .join(baseSA.select(col("doc_id"), col("pos"), col("sa_pos").as("old_pos")),
        Seq("doc_id", "pos"))
    // order by merged rank must reproduce the old ranks ascending
    val seq = old.orderBy("sa_pos").select("old_pos")
      .collect().map(_.getLong(0)).toSeq
    assert(seq == seq.sorted, "merge reordered previously indexed suffixes")
    assert(seq == (1L to seq.size).toSeq, "every base suffix must survive exactly once")
  }

  // ---- bucket-local coverage ------------------------------------------
  // The derived bucket size (≥8192) makes any spec-scale corpus a single
  // bucket, so these tests pass tiny explicit bucket sizes to force the
  // multi-bucket machinery: batch suffixes straddling many boundaries,
  // buckets the batch never touches (the arithmetic-shift path), and
  // range partitions with no marker (the prevb handoff).

  test("bucket-local merge equals the global one-shot merge for every split and bucket size") {
    (0 to corpus.size).foreach { k =>
      val (baseRows, batchRows) = corpus.splitAt(k)
      val baseSA = SelectionOps.suffixArrayOf(df(baseRows))
        .localCheckpoint(true) // one build, consumed by all bucket sizes
      val global = saRows(SelectionOps.saMergeGlobal(baseSA, df(baseRows), df(batchRows)))
      Seq(1L, 7L, 16L, 100L).foreach { bs =>
        val bucketed = saRows(SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows), bs))
        assert(bucketed == global,
          s"bucket size $bs at split $k diverged from the global merge")
      }
    }
  }

  test("untouched buckets survive by pure shift: a batch landing at one end of the key space") {
    // base sorted low keys; batch all 'z…' suffixes → only the LAST
    // bucket(s) are touched; every earlier bucket must come back via
    // the arithmetic shift path, bit-identical to the rebuild
    val baseRows = corpus
    val batchRows = Seq((100L, "zz zy zx zw"), (101L, "zzz"))
    val all = baseRows ++ batchRows
    val full = saRows(SelectionOps.suffixArrayOf(df(all)))
    val baseSA = SelectionOps.suffixArrayOf(df(baseRows)).localCheckpoint(true)
    Seq(5L, 13L, 64L).foreach { bs =>
      val merged = saRows(SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows), bs))
      assert(merged == full, s"end-loaded batch at bucket size $bs diverged from the rebuild")
    }
  }

  test("a batch key below the base minimum merges at the front of bucket 0") {
    val baseRows = corpus
    val batchRows = Seq((100L, "AA AB"), (101L, "A")) // uppercase < every base char
    val all = baseRows ++ batchRows
    val full = saRows(SelectionOps.suffixArrayOf(df(all)))
    val baseSA = SelectionOps.suffixArrayOf(df(baseRows)).localCheckpoint(true)
    Seq(5L, 64L).foreach { bs =>
      val merged = saRows(SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows), bs))
      assert(merged == full, s"front-loaded batch at bucket size $bs diverged from the rebuild")
    }
  }

  // ---- auto-regime ----------------------------------------------------

  test("the regime rule flips at the touched-majority crossover") {
    // tiny batch into a big corpus: bucket-local
    assert(!SelectionOps.saPrefersGlobal(touchedBase = 8192L,
      nBase = 1000000L, mChars = 4000L))
    // saturating batch (every bucket touched): global
    assert(SelectionOps.saPrefersGlobal(touchedBase = 1000000L,
      nBase = 1000000L, mChars = 90000L))
    // the boundary itself routes global (ties favor the simpler plan)
    assert(SelectionOps.saPrefersGlobal(touchedBase = 450000L,
      nBase = 1000000L, mChars = 100000L))
    assert(!SelectionOps.saPrefersGlobal(touchedBase = 449999L,
      nBase = 1000000L, mChars = 100000L))
    // batch alone comparable to the corpus: always global
    assert(SelectionOps.saPrefersGlobal(touchedBase = 0L,
      nBase = 1000L, mChars = 2000L))
  }

  test("auto-regime merges equal the rebuild on BOTH sides of the crossover") {
    // derived bucket size (no test hook): a spec-scale corpus is one
    // bucket, every append saturates it, so saMerge routes GLOBAL —
    // the fallback path end-to-end
    val (baseRows, batchRows) = corpus.splitAt(6)
    val full = saRows(SelectionOps.suffixArrayOf(df(corpus)))
    val baseSA = SelectionOps.suffixArrayOf(df(baseRows)).localCheckpoint(true)
    assert(saRows(SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows))) == full,
      "global-regime auto merge diverged from the rebuild")
    // forced tiny buckets (test hook): the switch is bypassed and the
    // bucket machinery runs even though this batch would saturate
    assert(saRows(SelectionOps.saMerge(baseSA, df(baseRows), df(batchRows), 7L)) == full,
      "bucket-regime merge diverged from the rebuild")
  }
}
