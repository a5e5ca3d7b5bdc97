package graft.functions

/** JIT-compiled vector math for the ANN/dedup hot loops — same
  * rationale as [[HashSketch]]: a cosine over a 64-dim array costs
  * ~130 interpreted expression evals as a Catalyst higher-order
  * function vs ~64 fused multiply-adds as plain Scala. Results are
  * bit-identical to the sequential-fold `zip_with`/`aggregate`
  * formulation (same order of operations), so relational and typed
  * stages can be mixed freely. */
object VectorOps {

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  /** Zero-norm convention: 0.0, never NaN — shared with
    * [[graft.plans.ArrayCosine]] and every oracle's
    * `coalesce(dot / NULLIF(denom, 0), 0)` rendering, so rank-based
    * comparisons stay engine-identical on degenerate (zero) vectors
    * such as an empty cluster's recomputed mean. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val denom = norm(a) * norm(b)
    if (denom == 0.0) 0.0 else dot(a, b) / denom
  }

  /** Cosine rounded to 6 decimals — matches the relational
    * `VectorQueries.cosine6` exactly (HALF_UP on a positive scale
    * factor is what Spark's round does; java.math does the same). */
  def cosine6(a: Array[Double], b: Array[Double]): Double =
    BigDecimal(cosine(a, b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Sign-bit binarization of a ≤64-dim vector into two 32-bit words
    * (lo = dims 0–31, hi = dims 32–63; bit set iff the coordinate is
    * strictly positive). Two BIGINT words rather than one 64-bit
    * word so the SQL oracle can build the same value without touching
    * the sign bit (1::BIGINT << 63 would go negative). The comparison
    * `> 0` involves no arithmetic, so the bits are engine-exact. */
  def signBits(a: Array[Double]): (Long, Long) = {
    var lo = 0L; var hi = 0L; var i = 0
    while (i < a.length && i < 32) { if (a(i) > 0) lo |= (1L << i); i += 1 }
    while (i < a.length && i < 64) { if (a(i) > 0) hi |= (1L << (i - 32)); i += 1 }
    (lo, hi)
  }

  /** The two nearest pivots (by ROUNDED cosine6 — the engine's
    * cross-engine-deterministic similarity — with first-wins ties →
    * lowest index): the IVF sub-bucketing cell key. (nearest,
    * second-nearest) refines B coarse buckets into B·(B−1) cells,
    * identical to ranking rows 1 and 2 of
    * (round(sim,6) desc, pivot_id asc) in SQL, so a SQL oracle can
    * replicate the assignment exactly; `._1` alone is the single-level
    * coarse assignment. */
  def nearest2Pivots(v: Array[Double], pivots: Array[Array[Double]]): (Int, Int) = {
    var b1 = -1; var s1 = Double.NegativeInfinity
    var b2 = -1; var s2 = Double.NegativeInfinity
    var p = 0
    while (p < pivots.length) {
      val s = cosine6(v, pivots(p))
      if (s > s1) { b2 = b1; s2 = s1; b1 = p; s1 = s }
      else if (s > s2) { b2 = p; s2 = s }
      p += 1
    }
    (b1, b2)
  }

  /** nProbe=2 probe rows for a bounded, sorted query set under
    * `pivots` — the driver-side probe contract shared by the IVF
    * candidate stage (v04 family), the IVF-pruned chunk MaxSim (v15)
    * and the retrain guard's recall probe: ONE place owns the nprobe
    * count and the [[nearest2Pivots]] tie ordering, so the serving
    * stages and the monitor can never silently diverge. Returns
    * (query_id, bucket, query_vector) rows, two per query. */
  def probePairs2(queries: Seq[(Long, Array[Double])],
      pivots: Array[Array[Double]]): IndexedSeq[(Long, Long, Array[Double])] =
    queries.flatMap { case (id, qv) =>
      val (b1, b2) = nearest2Pivots(qv, pivots)
      Seq((id, b1.toLong, qv), (id, b2.toLong, qv))
    }.toIndexedSeq

  /** Squared L2 distance between `b` and the window of `a` starting
    * at `off`, in integer MICRO-UNITS: floor(Σ(a−b)²·10⁶ + 0.5). The
    * double fold is sequential (identical on both engines), and the
    * micro-int result makes every downstream SUM order-free and
    * exact — the v10 PQ contract (a sum of rounded DOUBLES would be
    * order-dependent in a SQL aggregate; a sum of BIGINTs is not). */
  def l2sqMicro(a: Array[Double], off: Int, b: Array[Double]): Long = {
    var s = 0.0
    var i = 0
    while (i < b.length) { val d = a(off + i) - b(i); s += d * d; i += 1 }
    math.floor(s * 1e6 + 0.5).toLong
  }

  /** Index of the nearest codebook entry for the subvector of `a` at
    * `off` (micro-unit L2, strict `<` ⇒ first wins ⇒ lowest code id
    * when entries are sorted by code — the SQL rank-1 tie order). */
  def nearestCodeIdx(a: Array[Double], off: Int,
      codebook: Array[(Int, Array[Double])]): Int = {
    var best = 0
    var bd = Long.MaxValue
    var c = 0
    while (c < codebook.length) {
      val d = l2sqMicro(a, off, codebook(c)._2)
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** Nearest labeled centroid by ROUNDED cosine6 with first-wins ties
    * (callers pass centroids sorted ascending by id, so ties resolve
    * to the LOWEST id — identical to rank 1 of
    * (round(sim,6) desc, cid asc) in SQL). Returns (centroid id,
    * rounded similarity) — the k-means assignment primitive. */
  def nearestCentroidSim(
      v: Array[Double],
      centroids: Array[(Long, Array[Double])]): (Long, Double) = {
    var bi = 0; var bs = Double.NegativeInfinity
    var p = 0
    while (p < centroids.length) {
      val s = cosine6(v, centroids(p)._2)
      if (s > bs) { bi = p; bs = s }
      p += 1
    }
    (centroids(bi)._1, bs)
  }
}
