package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.TestSpark

/** Property fuzz for the banded hamming blocking: on ARBITRARY
  * signature sets and (sigBits, bands, maxHamming) geometries, the
  * banded self-join must equal the brute-force hamming ball exactly —
  * the pigeonhole recall claim, tested instead of trusted. The
  * generator is COLLISION-BIASED (signatures derived from a few seeds
  * by flipping 0..radius+2 bits) so near pairs actually occur; a
  * uniform-random generator would test the empty-output case only.
  */
class HammingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Case(sigBits: Int, bands: Int, maxHamming: Int,
                          sigs: List[(Long, Long)])

  private val caseGen: Gen[Case] = for {
    (sigBits, bands) <- Gen.oneOf((48, 4), (56, 4), (63, 7), (64, 8),
      (60, 6), (32, 2), (64, 1))
    maxHamming <- Gen.choose(0, bands - 1)
    nSeeds <- Gen.choose(1, 5)
    seeds <- Gen.listOfN(nSeeds, Gen.long)
    n <- Gen.choose(2, 40)
    sigs <- Gen.listOfN(n, for {
      seed <- Gen.oneOf(seeds)
      flips <- Gen.choose(0, maxHamming + 2)
      bits <- Gen.listOfN(flips, Gen.choose(0, sigBits - 1))
    } yield bits.foldLeft(seed)((s, b) => s ^ (1L << b)))
  } yield {
    val mask = if (sigBits >= 64) -1L else (1L << sigBits) - 1
    Case(sigBits, bands, maxHamming,
      sigs.zipWithIndex.map { case (s, i) => (i.toLong, s & mask) })
  }

  test("banded hammingNearDup = brute-force hamming ball on fuzzed " +
    "signatures across geometries (pigeonhole recall, all widths)") {
    val params = Gen.Parameters.default
    var seed = rng.Seed(20260815L)
    for (_ <- 1 to 30) {
      val c = caseGen.pureApply(params, seed)
      seed = seed.next
      val got = Dedup.hammingNearDup(c.sigs.toDF("id", "sig"), "id", "sig",
          c.sigBits, c.bands, c.maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val brute = (for {
        (a, sa) <- c.sigs; (b, sb) <- c.sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= c.maxHamming
      } yield (a, b, h)).toSet
      assert(got == brute,
        s"mismatch at sigBits=${c.sigBits} bands=${c.bands} " +
          s"maxHamming=${c.maxHamming} n=${c.sigs.size}\n" +
          s"banded-only: ${(got -- brute).take(5)}\n" +
          s"brute-only:  ${(brute -- got).take(5)}")
    }
  }
}
