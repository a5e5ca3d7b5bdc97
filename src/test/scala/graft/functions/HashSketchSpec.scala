package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HashSketchSpec extends AnyFunSuite {

  test("shingle3 matches the relational shingles semantics") {
    assert(HashSketch.shingle3("a b c d").toSeq === Seq("a b c", "b c d"))
    assert(HashSketch.shingle3("  a   b  ").toSeq === Seq("a b"))
    assert(HashSketch.shingle3("a b c a b c d").toSeq
      === Seq("a b c", "b c a", "c a b", "b c d")) // distinct, first-seen order
  }

  test("minhash: identical sets identical sigs; disjoint sets differ") {
    val a = HashSketch.minhash(HashSketch.shingle3("x y z w"), 65)
    val a2 = HashSketch.minhash(HashSketch.shingle3("x y z w"), 65)
    val b = HashSketch.minhash(HashSketch.shingle3("p q r s"), 65)
    assert(a.toSeq === a2.toSeq)
    assert(a.toSeq !== b.toSeq)
  }

  test("winnowing: shared long substrings guarantee shared fingerprints") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val d1 = "PREFIX ONE " + common + " SUFFIX A"
    val d2 = "totally different start " + common + " other ending here"
    val f1 = HashSketch.winnow(d1).toSeq
    val f2 = HashSketch.winnow(d2).toSeq
    assert(HashSketch.containmentSorted(f1, f2) > 0.3,
      "documents sharing a 60-char substring must share fingerprints")
    // unrelated docs share (almost) nothing
    val f3 = HashSketch.winnow("zz qq ww ee rr tt yy uu ii oo pp aa ss dd").toSeq
    assert(HashSketch.containmentSorted(f1, f3) < 0.2)
    // determinism + sorted output
    assert(HashSketch.winnow(d1).toSeq === f1)
    assert(f1 === f1.sorted)
  }

  test("jaccardSorted two-pointer merge") {
    assert(HashSketch.jaccardSorted(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) === 0.5)
    assert(HashSketch.jaccardSorted(Seq(), Seq()) === 1.0)
    assert(HashSketch.jaccardSorted(Seq(1L), Seq(2L)) === 0.0)
  }

  test("hamming over sub-signatures") {
    assert(HashSketch.hamming(Seq(0xff, 0x00), Seq(0x00, 0x00)) === 8)
    assert(HashSketch.hamming(Seq(0x0f, 0x01), Seq(0x0f, 0x00)) === 1)
  }

  test("simhash64 packs exactly the simhashSubs bytes (band extraction identity)") {
    for (text <- Seq("a b c d e f g", "data query the table join scan",
        "x y z", "one two three four five six seven eight nine ten")) {
      val sh = HashSketch.shingle3(text)
      val sig = HashSketch.simhash64(sh)
      val subs = HashSketch.simhashSubs(sh)
      for (b <- 0 until 8)
        assert(((sig >>> (b * 8)) & 0xffL).toInt === subs(b),
          s"byte $b of simhash64 must equal simhashSubs($b) for '$text'")
    }
  }

  test("bandKey: equal slices collide, differing slices (almost surely) don't") {
    val m1 = Array(1L, 2L, 3L, 4L, 5L, 99L)
    val m2 = Array(1L, 2L, 3L, 4L, 5L, 42L)
    assert(HashSketch.bandKey(m1, 0, 5) === HashSketch.bandKey(m2, 0, 5))
    assert(HashSketch.bandKey(m1, 1, 6) !== HashSketch.bandKey(m2, 1, 6))
  }
}
