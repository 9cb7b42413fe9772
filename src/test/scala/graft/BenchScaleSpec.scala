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
    // DIRECTIONALITY (round-17): a STARTUP spike caught by the base
    // stamp with a uniformly QUIET warm set must NOT brand — the
    // queries were measured quiet, a rerun can't improve them (and the
    // pinned base re-branded every rerun under the symmetric rule)
    assert(!Bench.warmLoaded(485, Seq((216, 245), (213, 266), (219, 250), (224, 278))),
      "a dilated base over a quiet warm set must not brand loaded")
  }

  test("scale-section loaded gate is DIRECTIONAL against the run's quiet floor") {
    val quietFloor = Some((210.0, 255.0))
    // quiet section against a quiet floor: pass
    assert(!Bench.sectionLoaded(quietFloor, Seq((212, 258), (214, 260), (211, 256))),
      "quiet section stamps must not brand loaded")
    // no stamps at all: never loaded
    assert(!Bench.sectionLoaded(quietFloor, Nil))
    // the round-16 sf10 signature: the section ENTERS already loaded
    // (entry ×7.9 the run floor) and quiets by exit — entry/exit alone
    // can't see it, the floor comparison must
    assert(Bench.sectionLoaded(quietFloor, Seq((1673, 2100), (220, 262))),
      "a section entering loaded against a quiet run floor must brand")
    // load constant THROUGH the section (entry and exit both dilated):
    // symmetric self-ratios are flat, the floor still catches it
    assert(Bench.sectionLoaded(quietFloor, Seq((600, 900), (610, 920), (605, 910))),
      "a uniformly loaded section vs a quiet floor must brand")
    // mid-section wave between quiet endpoints: the mid stamps carry it
    assert(Bench.sectionLoaded(quietFloor, Seq((212, 258), (214, 520), (213, 259))),
      "a wave contained between entry and exit must brand via mid stamps")
    // DIRECTIONALITY: a QUIET section under a LOADED parent floor must
    // NOT brand — a rerun cannot improve a section that measured quiet
    // (symmetric max/min would fire here: 2100/262 = 8x)
    assert(!Bench.sectionLoaded(Some((1673.0, 2100.0)), Seq((212, 258), (214, 260))),
      "a quiet section must never brand because the PARENT was loaded")
    // no floor (first run, env missing): the section's own stamps gate
    assert(Bench.sectionLoaded(None, Seq((212, 258), (215, 530))),
      "without a floor the section's own drift still brands")
    assert(!Bench.sectionLoaded(None, Seq((212, 258), (215, 262))),
      "without a floor a quiet section passes")
  }
}
