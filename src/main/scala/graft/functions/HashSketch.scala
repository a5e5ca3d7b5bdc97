package graft.functions

/** JVM-side MinHash / SimHash sketching over token shingles.
  *
  * These sketches are the one genuinely imperative hot loop in the
  * engine: 65 derived hash minima over every shingle of every
  * document. As Catalyst higher-order functions the loop evaluates
  * interpreted (HOF lambdas are CodegenFallback and get no
  * common-subexpression reuse — measured ~17 µs/op, 40+ s at sf0.01),
  * while as plain JIT-compiled Scala inside a typed `map` it is
  * ~50 ns/op. This is the documented `mapPartitions`-tier exception
  * of SURVEY.md §2.9: signature GENERATION is typed Scala; banding,
  * candidate joins and verification stay relational where Spark's
  * join machinery earns its keep.
  *
  * Hash values are internal-only (candidates are exact-verified), so
  * the hash family needs determinism, not external compatibility:
  * FNV-1a over UTF-8 bytes + splitmix64 finalizing per function index.
  */
object HashSketch {

  /** 3-token shingles, distinct, identical semantics to the Catalyst
    * `DedupQueries.shingles` expression (split on \s+ of trimmed
    * text; <3 tokens → the whole doc as one shingle). */
  def shingle3(text: String): Array[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < 3) Array(toks.mkString(" "))
    else {
      val out = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + 2 < toks.length) {
        out.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      out.toArray(new Array[String](out.size))
    }
  }

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — derives hash function i from a base hash. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** n min-hashes over the shingle set: min_i over shingles of
    * mix(base(shingle) + i * GOLDEN). One string hash per shingle,
    * n cheap long mixes per (shingle, i). */
  def minhash(shingles: Array[String], n: Int): Array[Long] = {
    val mins = Array.fill(n)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val base = fnv1a64(shingles(s))
      var i = 0
      while (i < n) {
        val h = mix(base + i * 0x9e3779b97f4a7c15L)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    mins
  }

  /** 64-bit SimHash over the shingle set as a single packed long —
    * bit j set iff the majority of shingle hashes have bit j set.
    * Banding and Hamming distance stay RELATIONAL on this: band b's
    * key is `(sig >> 8b) & 255` and the distance is
    * `bit_count(a ^ b)` — both codegen'd integer expressions, no
    * array columns, no interpreted higher-order functions. */
  def simhash64(shingles: Array[String]): Long = {
    val votes = new Array[Int](64)
    var s = 0
    while (s < shingles.length) {
      val h = mix(fnv1a64(shingles(s)))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      s += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** 64-bit SimHash over the shingle set, returned as 8 × 8-bit
    * sub-signatures (the Hamming-blocking band keys; byte b of
    * [[simhash64]]). */
  def simhashSubs(shingles: Array[String]): Array[Int] = {
    val votes = new Array[Int](64)
    var s = 0
    while (s < shingles.length) {
      val h = mix(fnv1a64(shingles(s)))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      s += 1
    }
    val subs = new Array[Int](8)
    var b = 0
    while (b < 8) {
      var sub = 0
      var r = 0
      while (r < 8) {
        if (votes(b * 8 + r) >= 0) sub |= (1 << r)
        r += 1
      }
      subs(b) = sub
      b += 1
    }
    subs
  }

  /** Collapse one minhash band (a consecutive signature slice) to a
    * single 64-bit band key via sequential mix-combine. A key
    * collision can only create an extra CANDIDATE pair (which exact
    * verification then rejects), never a miss — so LSH recall is
    * unaffected while the banded join shuffles one long instead of a
    * boxed array per band. */
  def bandKey(mins: Array[Long], from: Int, until: Int): Long = {
    var h = 0x9e3779b97f4a7c15L
    var i = from
    while (i < until) { h = mix(h ^ mins(i)); i += 1 }
    h
  }

  /** Sorted distinct base hashes of the shingle set — the compact
    * verify representation (set Jaccard over hashes equals Jaccard
    * over shingles modulo 64-bit collisions). */
  def hashSet(shingles: Array[String]): Array[Long] = {
    val hs = shingles.map(fnv1a64).distinct
    java.util.Arrays.sort(hs)
    hs
  }

  /** Exact Jaccard of two SORTED long arrays via two-pointer merge. */
  def jaccardSorted(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD '03):
    * rolling Rabin–Karp hashes over character k-grams, then the
    * minimum hash of every sliding window of `w` consecutive k-gram
    * hashes (rightmost minimum on ties). The selected minima are a
    * position-robust fingerprint set — shared substrings of length
    * ≥ w+k−1 guarantee shared fingerprints. */
  def winnow(text: String, k: Int = 8, w: Int = 6): Array[Long] = {
    val s = text
    if (s.length < k) return Array(fnv1a64(s))
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = mix(h)
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = mix(h)
      i += 1
    }
    if (n <= w) return Array(hashes.min)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var start = 0
    while (start + w <= n) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      out.add(hashes(minIdx))
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  /** Containment of sorted fingerprint sets: |A∩B| / min(|A|,|B|). */
  def containmentSorted(a: Seq[Long], b: Seq[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val m = math.min(a.length, b.length)
    if (m == 0) 1.0 else inter.toDouble / m
  }

  /** Hamming distance between two sub-signature arrays. */
  def hamming(a: Seq[Int], b: Seq[Int]): Int = {
    var d = 0
    var i = 0
    while (i < a.length) {
      d += java.lang.Integer.bitCount(a(i) ^ b(i))
      i += 1
    }
    d
  }
}
