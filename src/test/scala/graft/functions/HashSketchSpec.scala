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

  test("polyHash is the left fold (h*131 + c) mod P from 0") {
    val p = HashSketch.P
    assert(HashSketch.polyHash("") === 0L)
    assert(HashSketch.polyHash("a") === 'a'.toLong)
    assert(HashSketch.polyHash("abc")
      === ((('a'.toLong * 131 + 'b') % p) * 131 + 'c') % p)
    // stays in [0, P) on long inputs
    val h = HashSketch.polyHash("x" * 10000)
    assert(h >= 0 && h < p)
  }

  test("simhash128: deterministic; near-identical docs close, unrelated docs far") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu one two three " +
      "four five six seven eight nine ten"
    val near = base.replace("oscar", "oscarx") // 3 of ~34 shingles change
    val far = "completely different content about catalyst optimizer " +
      "rules and shuffle partitions in a distributed query engine with " +
      "columnar storage and vectorized execution kernels plus adaptive planning"
    val s1 = HashSketch.simhash128(HashSketch.shingle3(base))
    val s2 = HashSketch.simhash128(HashSketch.shingle3(base))
    val s3 = HashSketch.simhash128(HashSketch.shingle3(near))
    val s4 = HashSketch.simhash128(HashSketch.shingle3(far))
    assert(s1 === s2)
    assert(ham(s1, s3) < ham(s1, s4),
      s"near doc (${ham(s1, s3)}) must be closer than unrelated (${ham(s1, s4)})")
    // random unrelated 128-bit sigs sit near Hamming 64; demand the
    // unrelated pair is in the far regime and the near pair is not
    assert(ham(s1, s4) > 30, s"unrelated hamming ${ham(s1, s4)} suspiciously low")
    assert(ham(s1, s3) < 30, s"near-dup hamming ${ham(s1, s3)} suspiciously high")
  }

  test("simhash128 band slices match the relational extraction expression") {
    // d02 extracts band keys as (lo >> (band*16)) & 65535 (bands 0-3)
    // and (hi >> ((band-4)*16)) & 65535 (bands 4-7); pin the packing
    for (text <- Seq("a b c d e f g", "data query the table join scan",
        "x y z", "one two three four five six seven eight nine ten")) {
      val (lo, hi) = HashSketch.simhash128(HashSketch.shingle3(text))
      val slices = (0 until 8).map { b =>
        if (b < 4) (lo >> (b * 16)) & 0xffffL else (hi >> ((b - 4) * 16)) & 0xffffL
      }
      assert(slices.forall(s => s >= 0 && s <= 65535))
      val relo = (0 until 4).map(b => slices(b) << (b * 16)).reduce(_ | _)
      val rehi = (4 until 8).map(b => slices(b) << ((b - 4) * 16)).reduce(_ | _)
      assert(relo === lo && rehi === hi, s"band slices must tile the sig for '$text'")
    }
  }

  test("bandKey: equal slices collide, differing slices (almost surely) don't") {
    val m1 = Array(1L, 2L, 3L, 4L, 5L, 99L)
    val m2 = Array(1L, 2L, 3L, 4L, 5L, 42L)
    assert(HashSketch.bandKey(m1, 0, 5) === HashSketch.bandKey(m2, 0, 5))
    assert(HashSketch.bandKey(m1, 1, 6) !== HashSketch.bandKey(m2, 1, 6))
  }
}
