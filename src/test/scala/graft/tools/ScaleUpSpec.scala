package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-up replication methodology that BENCH_SCALE.json's
  * scaling-curve claims depend on: marked copies must not look like
  * near-duplicates of the original (else candidate pairs inflate ~N²
  * and the measured curve stops representing a real bigger corpus). */
class ScaleUpSpec extends AnyFunSuite {
  import graft.functions.HashSketch

  test("mark: copy 0 is the identity") {
    val t = "alpha bravo charlie delta echo foxtrot"
    assert(ScaleUp.mark(t, 0) === t)
  }

  test("mark: copies share ZERO 3-shingles with the original or each other") {
    val t = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val s0 = HashSketch.shingle3(t).toSet
    val s1 = HashSketch.shingle3(ScaleUp.mark(t, 1)).toSet
    val s2 = HashSketch.shingle3(ScaleUp.mark(t, 2)).toSet
    assert((s0 intersect s1).isEmpty, "copy 1 must share no shingles with copy 0")
    assert((s0 intersect s2).isEmpty, "copy 2 must share no shingles with copy 0")
    assert((s1 intersect s2).isEmpty, "distinct copies must not collide with each other")
  }

  test("mark: within-copy near-dup structure is preserved") {
    // two docs differing in ONE token stay near-dups after marking:
    // the marker interleave is position-aligned for equal-length docs
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = a.replace("echo", "echoX")
    val ja = HashSketch.shingle3(ScaleUp.mark(a, 3)).toSet
    val jb = HashSketch.shingle3(ScaleUp.mark(b, 3)).toSet
    val jacc = (ja intersect jb).size.toDouble / (ja union jb).size
    assert(jacc > 0.5,
      f"marked near-dups must remain near-dups (J = $jacc%.2f)")
  }
}
