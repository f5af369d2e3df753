package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

/** Property pin for the q45 banded-LSH rewrite: candidate generation by
  * 5×12-bit band equality is EXACT for hamming ≤ 4 — the pigeonhole
  * argument as executable evidence (4 differing bits touch ≤ 4 of the
  * 5 bands, so one band is untouched). The converse direction (band
  * collision ⇏ near-dup) is why the hamming filter stays downstream. */
class BandedLshSpec extends AnyFunSuite {

  private def bands(sig: Long): Seq[Int] =
    (0 until 5).map(b => ((sig >>> (b * 12)) & 0xfff).toInt)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def gen[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  test("any pair with hamming <= 4 over 60 bits shares at least one 12-bit band") {
    val sigGen = Gen.chooseNum(0L, (1L << 60) - 1)
    val flipsGen = for {
      k <- Gen.chooseNum(0, 4)
      bits <- Gen.pick(k, 0 until 60)
    } yield bits.toSeq
    (1 to 2000).foreach { i =>
      val a = gen(sigGen, i.toLong)
      val b = gen(flipsGen, i.toLong + 100000)
        .foldLeft(a)((acc, bit) => acc ^ (1L << bit))
      assert(hamming(a, b) <= 4)
      assert(bands(a).zip(bands(b)).exists { case (x, y) => x == y },
        s"pigeonhole violated for a=$a b=$b (hamming=${hamming(a, b)})")
    }
  }

  test("5 flips CAN evade banding (one per band) — the bound is tight") {
    // one flipped bit inside each of the 5 bands → no band matches;
    // shows hamming <= 4 is exactly the guarantee the 5-band split buys.
    val a = 0L
    val b = (0 until 5).foldLeft(a)((acc, band) => acc ^ (1L << (band * 12)))
    assert(hamming(a, b) == 5)
    assert(!bands(a).zip(bands(b)).exists { case (x, y) => x == y })
  }

  // ---- q44 MinHash windows: independence under a hot shingle ---------

  /** JVM mirror of q44's hash-function formula (DedupOps): the 8
    * non-overlapping 8-hex windows of md5(sh) || md5('1' || sh). */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def window(sh: String, i: Int): String = {
    val h2 = md5hex(sh) + md5hex("1" + sh)
    h2.substring(i * 8, i * 8 + 8)
  }

  test("q44 hot shingle shared by every doc does not weld docs into one band clique") {
    // Round-2 failure mode: with OVERLAPPING windows of one digest, a
    // single low-digest shingle present in many docs wins all 8 mins at
    // once → all band keys equal → quadratic bucket. Fixture: 40 docs of
    // 30 unique shingles each, plus one shared shingle chosen to be the
    // GLOBAL minimum under hash 0 (the worst case — it wins m0 for every
    // doc by construction). Independence of the other windows must keep
    // the band keys apart.
    val docs = (0 until 40).map(i => (0 until 30).map(j => s"doc${i}_sh$j"))
    val hot = docs.flatten.minBy(window(_, 0))
    val withHot = docs.map(_ :+ hot)
    val mins: Seq[Seq[String]] = withHot.map(doc => (0 until 8).map(i => doc.map(window(_, i)).min))
    // the hot shingle does win hash 0 everywhere (fixture is the worst case)
    assert(mins.forall(_.head == window(hot, 0)))
    // …but band keys (m0||m1, m2||m3, m4||m5, m6||m7) must not collapse:
    // no band bucket may contain every doc, and band 0 (the one the hot
    // shingle dominates half of) must still spread across many keys.
    val bandKeys = (0 until 4).map(b => mins.map(m => m(2 * b) + m(2 * b + 1)))
    bandKeys.zipWithIndex.foreach { case (keys, b) =>
      val biggestBucket = keys.groupBy(identity).values.map(_.size).max
      assert(biggestBucket < docs.size,
        s"band $b welded all ${docs.size} docs into one bucket")
    }
    assert(bandKeys.head.distinct.size > docs.size / 2,
      "band-0 keys should stay nearly per-doc: m1 is independent of the hot shingle's m0")
  }
}

/** Pins for the corpus-derived hyperplane-LSH shape of q47/q62/q159
  * (`VectorOps.lshShape`): the derivation the DuckDB oracles mirror
  * from `count(*)` must produce exactly these values at the fixture
  * sizes and stay clamped at the extremes — a silent drift here would
  * desynchronize Spark and oracle candidate sets everywhere. */
class AdaptiveLshShapeSpec extends AnyFunSuite {
  import graft.operators.VectorOps.lshShape

  test("fixture-size derivations match the oracle's length(bin(cnt))-1 rule") {
    assert(lshShape(500L, 12) == ((4, 16)))   // sf0.01
    assert(lshShape(500L, 8) == ((4, 12)))
    assert(lshShape(2000L, 12) == ((5, 20)))  // sf0.1
    assert(lshShape(2000L, 8) == ((5, 16)))
    // above N = 4096 the occupancy-bounded regime takes over
    // (bits = ilog2 - 6, occupancy <= 64): the round-8 100x rehearsal
    // showed sqrt(N) occupancy out-spilling a disk at N = 200k
    assert(lshShape(20000L, 12) == ((8, 24))) // sf1 rehearsal (capped tables)
    assert(lshShape(20000L, 8) == ((8, 24)))
    assert(lshShape(200000L, 12) == ((11, 24))) // sf10 rehearsal: occupancy ~97
    assert(lshShape(4096L, 12)._1 == 6) // regime crossover is continuous
  }

  test("clamps: tiny corpora floor at 3 bits, huge corpora cap at 12 bits x 24 tables") {
    assert(lshShape(1L, 12) == ((3, 12)))
    assert(lshShape(0L, 8) == ((3, 8))) // degenerate empty input stays sane
    assert(lshShape(1L << 40, 12) == ((12, 24)))
    assert(lshShape(Long.MaxValue, 8) == ((12, 24)))
  }

  test("power-of-two boundaries are exact (the reason for integer bit-length, not float log2)") {
    assert(lshShape(255L, 12)._1 == 3)  // ilog2=7 -> 3
    assert(lshShape(256L, 12)._1 == 4)  // ilog2=8 -> 4
    assert(lshShape(1023L, 12)._1 == 4) // ilog2=9 -> 4
    assert(lshShape(1024L, 12)._1 == 5) // ilog2=10 -> 5
  }
}
