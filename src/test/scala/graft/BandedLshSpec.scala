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
}
