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

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var (d, na, nb) = (0.0, 0.0, 0.0)
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / math.sqrt(na * nb)
  }

  private def pseudoVec(seed: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      var z = seed.toLong * 0x2545F4914F6CDD1DL + i * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
      ((z >>> 20).toInt % 1000) / 500f - 1f
    }

  test("rotate: copy 0 is the identity; copies are no longer exact twins") {
    val v = pseudoVec(7, 64)
    assert(ScaleUp.rotate(v, 0) eq v)
    for (k <- Seq(1, 5, 64, 100)) { // 64 wraps the shift: signs must still differ
      val c = cos(v, ScaleUp.rotate(v, k))
      assert(math.abs(c) < 0.6,
        f"copy $k must decorrelate from the original (cos = $c%.3f)")
    }
  }

  test("rotate: orthogonal — every within-copy cosine is preserved exactly") {
    val a = pseudoVec(1, 64)
    val b = pseudoVec(2, 64)
    // a near-dup pair: b' = a with one coordinate nudged
    val nd = a.clone(); nd(10) += 0.05f
    for (k <- Seq(1, 9, 100)) {
      assert(math.abs(cos(a, b) - cos(ScaleUp.rotate(a, k), ScaleUp.rotate(b, k))) < 1e-6)
      assert(math.abs(cos(a, nd) - cos(ScaleUp.rotate(a, k), ScaleUp.rotate(nd, k))) < 1e-6)
    }
  }
}
