package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import graft.operators.CurationOps

/** Self-consistency invariants of the curation operators — properties
  * that must hold for ANY corpus, complementing the DuckDB value
  * oracle (which pins one corpus): packing conservation, benchmark
  * exclusion, fraction ranges, and the tier ordering of the mix. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curation-spec")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  test("q74 packing conserves tokens: per shard, sequence sums equal the input; only tails are short") {
    val packed = CurationOps.q74_sequence_pack.run(spark, dir)
      .select("shard", "seq_id", "n_tokens").as[(Long, Long, Long)].collect()
    val totalPacked = packed.map(_._3).sum
    val totalInput = graft.sources.Tables.load(spark, dir, "documents")
      .selectExpr("CAST(sum(size(split(text, ' '))) AS BIGINT)").as[Long].head()
    assert(totalPacked == totalInput,
      s"packing must conserve every token ($totalPacked != $totalInput)")
    packed.groupBy(_._1).foreach { case (shard, seqs) =>
      val ids = seqs.map(_._2).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1,
        s"shard $shard sequence ids must be contiguous from 0: ${ids.toSeq}")
      val (tail, full) = (seqs.maxBy(_._2), seqs.filterNot(_._2 == seqs.map(_._2).max))
      assert(full.forall(_._3 == 256),
        s"every non-tail sequence holds exactly the 256-token budget (shard $shard)")
      assert(tail._3 <= 256, s"tail must not exceed the budget (shard $shard)")
    }
  }

  test("q70 never flags a benchmark doc; overlap counts are positive") {
    val rows = CurationOps.q70_decontaminate.run(spark, dir)
      .select("doc_id", "n_grams_shared", "n_bench_hits").as[(Long, Long, Long)].collect()
    assert(rows.forall(_._1 % 50 != 0), "the eval set itself is never a contamination hit")
    assert(rows.forall(r => r._2 > 0 && r._3 > 0))
  }

  test("q72 fractions are well-formed") {
    val rows = CurationOps.q72_quality_repetition.run(spark, dir)
      .select("n_2g", "n_dup_2g", "top_frac", "dup_frac")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, dup, top, dupf) =>
      assert(dup <= n && top > 0.0 && top <= 1.0 && dupf >= 0.0 && dupf <= 1.0)
    }
  }

  test("q73 tiers downsample in order; the full tier keeps everything") {
    val rows = CurationOps.q73_domain_mix.run(spark, dir)
      .select("source", "n_docs", "n_kept").as[(String, Long, Long)].collect()
    def frac(p: String => Boolean): Double = {
      val sel = rows.filter(r => p(r._1))
      sel.map(_._3).sum.toDouble / sel.map(_._2).sum
    }
    val t1 = Set("src0", "src1", "src2", "src3", "src4")
    val t2 = Set("src5", "src6", "src7", "src8", "src9")
    assert(frac(t1) == 1.0, "threshold 256 admits every bucket — the full tier keeps all docs")
    assert(frac(t2) < 1.0 && frac(s => !t1(s) && !t2(s)) < frac(t2),
      "lower tiers keep monotonically less")
  }
}
