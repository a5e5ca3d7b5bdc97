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
  * Two hash families live here, chosen by what the output must be
  * comparable against:
  *  - FNV-1a + splitmix64 (64-bit wrapping, fastest): used where
  *    values never cross the engine boundary — d01's VERIFY hash sets
  *    ([[hashSet]], exact-Jaccard-equivalent modulo collisions).
  *  - mod-P polynomial hashes ([[polyHash]]/[[diffuse]]) whose every
  *    intermediate fits a BIGINT: used wherever the DuckDB oracle must
  *    recompute the values — SimHash signatures (d02), winnowing
  *    fingerprints (t07), and since round 5 the d01 MINHASH BANDING
  *    ([[minhashModP]]/[[bandKeyModP]]) too, so the oracle can replay
  *    the banded candidate join instead of quadratic all-pairs SQL.
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

  /** Lowercase hex md5 over UTF-8 bytes — the JVM rendering of both
    * engines' `md5(...)` (Spark's and DuckDB's md5 emit the same
    * lowercase hex), for typed hot loops that must agree with an SQL
    * oracle byte-for-byte. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** JVM rendering of [[graft.functions.DetHash.hash60]] — first 15
    * hex chars of md5(s || ':' || salt) as a non-negative 60-bit
    * long. Bit-identical to the Column and SQL renderings, so typed
    * stages can bucket by the library-wide deterministic hash. */
  def hash60Jvm(s: String, salt: String): Long =
    java.lang.Long.parseLong(md5Hex(s + ":" + salt).substring(0, 15), 16)

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
    * n cheap long mixes per (shingle, i). (Kept for comparison specs;
    * d01 moved to [[minhashModP]] so its ORACLE can recompute the
    * banding — 64-bit wrapping arithmetic is not SQL-expressible.) */
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

  /** n min-hashes in the ORACLE-MIRRORABLE mod-[[P]] affine family:
    * h_i(x) = diffuse((x·A_i + B_i) mod P) over
    * x = diffuse(polyHash(shingle)), with
    * A_i = 1 + (diffuse((i+1)·1000003 mod P) mod (P−1)) ∈ [1, P−1]
    * (never 0 — a zero multiplier would collapse h_i to a constant)
    * and B_i = diffuse(A_i). Every intermediate fits a BIGINT
    * (x·A_i < P² < 2⁶³), so DuckDB recomputes the identical minima —
    * which is what lets d01's oracle replay the BANDED candidate
    * generation instead of quadratic all-pairs SQL. Affine maps mod a
    * prime are a classic universal family, so per-index minima remain
    * valid MinHash estimators. */
  def minhashModP(shingles: Array[String], n: Int): Array[Long] = {
    val as = new Array[Long](n)
    val bs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val a = 1 + diffuse((i + 1) * 1000003L % P) % (P - 1)
      as(i) = a
      bs(i) = diffuse(a)
      i += 1
    }
    val mins = Array.fill(n)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val x = diffuse(polyHash(shingles(s)))
      var j = 0
      while (j < n) {
        val h = diffuse((x * as(j) + bs(j)) % P)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      s += 1
    }
    mins
  }

  /** mod-[[P]] band key over a signature slice: left fold
    * (k·131 + m) mod P from 0 — identical to DuckDB's
    * `list_reduce(list(m ORDER BY i), (k, m) -> (k*131 + m) % P)`
    * (which seeds from the first element; equal because
    * 0·131 + m₁ = m₁). Key collisions only ADD candidates, which the
    * exact verify filters — and both engines compute the same keys, so
    * candidates match exactly either way. */
  def bandKeyModP(mins: Array[Long], from: Int, until: Int): Long = {
    var k = 0L
    var i = from
    while (i < until) { k = (k * 131 + mins(i)) % P; i += 1 }
    k
  }

  /** Modulus shared by every ORACLE-MIRRORABLE hash below. All values
    * stay in [0, P) and every intermediate product is < P² ≈ 10¹⁸ <
    * 2⁶³, so Scala Long and DuckDB BIGINT evaluate the identical
    * integer sequence — which is what lets d02/t07 carry full DuckDB
    * oracles instead of rows-only checks (64-bit wrapping hashes like
    * FNV/xxhash are NOT SQL-expressible; mod-P polynomial hashes
    * are). */
  val P = 1000000007L

  /** Polynomial string hash mod [[P]], base 131, folded left-to-right
    * from 0. DuckDB-identical form:
    * `list_reduce(list_transform(generate_series(1, length(s)),
    *    i -> CAST(ascii(s[i]) AS BIGINT)), (h, c) -> (h*131+c) % P)`
    * (list_reduce seeds from the first element, which equals folding
    * from 0 since 0*131 + c₀ = c₀). Parity assumes single-byte code
    * points — the testdata corpus is 100% ASCII. */
  def polyHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 131 + s.charAt(i)) % P; i += 1 }
    h
  }

  /** Quadratic diffusion mod [[P]] — the non-linear mixing step that
    * decorrelates low bits of related polynomial hashes while staying
    * a one-line BIGINT expression in the oracle. */
  def diffuse(x: Long): Long = (x * x + x) % P

  /** Per-band affine multipliers/offsets for [[simhash128]] — fixed
    * constants < P, duplicated literally in the d02 oracle SQL. */
  val BandA: Array[Long] = Array(
    236898829L, 681205763L, 105683867L, 893741531L,
    319406581L, 748807279L, 552167521L, 407145341L)
  val BandB: Array[Long] = Array(
    85734059L, 962623609L, 227583979L, 664051099L,
    133987433L, 503595613L, 847421867L, 318037609L)

  /** 128-bit SimHash over the shingle set as TWO packed longs
    * (lo = bands 0–3, hi = bands 4–7; 16 bits per band): bit (b,j) is
    * the majority vote over shingles of bit j of
    * `diffuse(diffuse(polyHash(shingle)) * BandA(b) + BandB(b))`.
    *
    * 16-bit bands are the SCALE parameterization (vs 8-bit bands of a
    * 64-bit sig): P(two random docs collide in a band) drops 256× to
    * 1/65536, so random-pair candidates stop being the quadratic
    * blowup term at corpus scale. The pigeonhole recall guarantee
    * comes from multi-probe banding in d02: Hamming ≤ 15 over 8 bands
    * forces ≥ 1 band with ≤ 1 differing bit, which a single-bit-flip
    * probe catches. Banding and Hamming stay RELATIONAL on the packed
    * longs: band key = 16-bit slice, distance =
    * `bit_count(lo⊕lo') + bit_count(hi⊕hi')` — codegen'd integer
    * expressions, no array columns. */
  def simhash128(shingles: Array[String]): (Long, Long) = {
    val votes = new Array[Int](128)
    var s = 0
    while (s < shingles.length) {
      val x = diffuse(polyHash(shingles(s)))
      var b = 0
      while (b < 8) {
        val z = diffuse((x * BandA(b) + BandB(b)) % P)
        var j = 0
        while (j < 16) {
          val i = b * 16 + j
          if (((z >>> j) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          j += 1
        }
        b += 1
      }
      s += 1
    }
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < 64) { if (votes(i) >= 0) lo |= (1L << i); i += 1 }
    while (i < 128) { if (votes(i) >= 0) hi |= (1L << (i - 64)); i += 1 }
    (lo, hi)
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
    * minimum hash VALUE of every sliding window of `w` consecutive
    * k-gram hashes. The selected minima are a position-robust
    * fingerprint set — shared substrings of length ≥ w+k−1 guarantee
    * shared fingerprints.
    *
    * Hashing is [[polyHash]]-consistent mod-P arithmetic (the rolling
    * recurrence computes exactly `diffuse(polyHash(kgram))` for every
    * k-gram), so the DuckDB oracle reproduces every fingerprint by
    * hashing each `substr(text, i, k)` directly — rolling is only the
    * O(n) evaluation strategy, not a different function. The output is
    * the DISTINCT SORTED minima values (position tie-breaks never
    * change the selected VALUE, so min-per-window is well-defined on
    * both engines). */
  def winnow(text: String, k: Int = 8, w: Int = 6): Array[Long] = {
    val s = text
    if (s.length < k) return Array(diffuse(polyHash(s)))
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    val B = 131L
    var pow = 1L // 131^(k-1) mod P
    var i = 0
    while (i < k - 1) { pow = (pow * B) % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + s.charAt(i)) % P; i += 1 }
    hashes(0) = diffuse(h)
    i = 1
    while (i < n) {
      h = ((h - s.charAt(i - 1) * pow) % P + P) % P
      h = (h * B + s.charAt(i + k - 1)) % P
      hashes(i) = diffuse(h)
      i += 1
    }
    if (n <= w) return Array(hashes.min)
    val out = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start + w <= n) {
      var m = hashes(start)
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) < m) m = hashes(j)
        j += 1
      }
      out.add(m)
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
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

}
