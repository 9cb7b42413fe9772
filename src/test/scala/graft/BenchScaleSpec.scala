package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the 100× corpus generator's perturbation contract (no Spark
  * session — pure function checks). The scale probes measure INPUT
  * slope; if two copies of the corpus ever collided, the dedup probes
  * would silently measure an output-pair explosion instead (the exact
  * failure mode the 10× generator's comment documents), so the cipher
  * properties are worth a spec, not an argument. */
class BenchScaleSpec extends AnyFunSuite {

  test("affine alphabets: identity at copy 0, distinct permutations through 312") {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    assert(Bench.affineAlphabet(0) === abc,
      "copy 0 must be the identity — the base corpus rides verbatim")
    val all = (0 until 312).map(Bench.affineAlphabet)
    // each is a PERMUTATION of a-z: translate() then maps bijectively,
    // so a ciphered copy loses no token structure
    all.foreach(a => assert(a.sorted === abc, s"not a permutation: $a"))
    // pairwise distinct through the documented validity bound: two
    // copies sharing an alphabet would be byte-identical corpora and
    // every doc would gain a spurious cross-copy exact dup
    assert(all.distinct.size === all.size,
      "affine alphabets must be pairwise distinct for 312 copies")
    // and past the bound it wraps (documented, not asserted in prod
    // code): copy 312 repeats copy 0
    assert(Bench.affineAlphabet(312) === Bench.affineAlphabet(0))
  }

  test("affine alphabets diverge on most letters between any two copies") {
    // near-dup pipelines shingle TOKENS; two ciphers agreeing on most
    // letters would leave most tokens unchanged and re-create the
    // cross-copy near-dup explosion. Affine maps over Z26 with a
    // coprime multiplier agree on at most 2 positions (x(a1-a2) ≡
    // b2-b1 has ≤ gcd(a1-a2, 26) ≤ 2 solutions when a1 ≠ a2; equal
    // multipliers with different shifts agree nowhere).
    val pairs = for (i <- 0 until 100; j <- (i + 1) until 100) yield (i, j)
    pairs.foreach { case (i, j) =>
      val a = Bench.affineAlphabet(i); val b = Bench.affineAlphabet(j)
      val agree = a.zip(b).count { case (x, y) => x == y }
      assert(agree <= 2, s"copies $i and $j agree on $agree letters")
    }
  }

  test("warm-set loaded gate: quiet runs pass, drifted or dilated runs brand loaded") {
    // stamps are (single-thread ms, all-cores ms) pairs; base mt rides
    // in front. Quiet host: every value within normal jitter → false
    assert(!Bench.warmLoaded(250, Seq((210, 255), (215, 260), (212, 258))),
      "a quiet run must not brand loaded")
    // no stamps (child mode / filtered run): never loaded
    assert(!Bench.warmLoaded(250, Nil))
    // the round-15 signature: quiet entry, load wave lands mid-set —
    // exit all-cores calib > 1.4× entry
    assert(Bench.warmLoaded(250, Seq((210, 255), (215, 400), (212, 520))),
      "mid-set mt drift past 1.4x must brand loaded")
    // load present for the whole warm set but NOT at the base stamp:
    // the base mt is in the drift pool, so uniform-high warm stamps
    // still brand loaded
    assert(Bench.warmLoaded(250, Seq((215, 390), (213, 400), (214, 395))),
      "uniformly dilated warm stamps vs a quiet base must brand loaded")
    // heavier-than-cores load dilates even the single-thread loop
    assert(Bench.warmLoaded(250, Seq((210, 255), (340, 260))),
      "single-thread drift past 1.5x must brand loaded")
    // SMT hosts run mt at a constant multiple of st when quiet — a
    // LEVEL difference between st and mt alone must NOT brand loaded
    // (only ratios across same-kind stamps count)
    assert(!Bench.warmLoaded(500, Seq((210, 510), (212, 505), (208, 515))),
      "a constant st-vs-mt level gap is host topology, not load")
  }
}
