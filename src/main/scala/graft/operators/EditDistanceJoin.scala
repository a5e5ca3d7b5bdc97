package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein ≤ 1) similarity join — the record-
  * linkage dedup family the banded token/bit families (d01/d02/d05,
  * t05) cannot express: their signatures are SET-shaped (shingles,
  * hashed grams), so a one-character typo in a short key field
  * ("Customer#000000042" vs "Customer#000000043") perturbs every
  * overlapping gram and the pair never collides, while its edit
  * distance is exactly 1. Entity resolution over name/id/address
  * columns is where this family earns its keep.
  *
  * Blocking is the DELETION NEIGHBORHOOD (FastSS — Bocek et al.,
  * "Fast Similarity Search in Large Dictionaries", U. Zurich tech
  * report 2007; the same public design behind SymSpell): each
  * string's variant set is itself plus every single-character
  * deletion (L+1 variants of length ≥ L−1). For threshold 1 this is
  * PROVABLY LOSSLESS — ed(a,b) ≤ 1 case-splits into b = a (share the
  * identity variant), b = a minus one char (b IS a variant of a),
  * and one substitution (deleting the differing position from both
  * yields a common variant) — so candidates = pairs sharing ≥ 1
  * variant is a SUPERSET of the true pairs, and the exact
  * `levenshtein` verify on candidates only makes the join exact.
  * EditDistanceJoinSpec pins losslessness against the all-pairs
  * brute force; the driver oracle replays the identical
  * neighborhood CTE-for-CTE in DuckDB.
  *
  * Scale shape: variant generation is a narrow projection + explode
  * (O(Σ Lᵢ) rows, each a short string — never the corpus rows
  * themselves); candidates come from ONE hash-partitioned equi-join
  * on the variant string (high-cardinality key, `a_key < b_key`
  * residual dedups the symmetric pair); verification touches only
  * the distinct candidate pairs, with Spark's THRESHOLDED
  * levenshtein (early-exit at distance 2 — O(L) band, not O(L²)
  * full matrix). No window, no sort, no cartesian (plan-pinned).
  * Candidate mass is quadratic in per-variant bucket size — near-
  * unique key fields (the family's use case) keep buckets ≤ a few
  * rows; a corpus whose variants are boilerplate-shared should
  * route the bucket-mass list through [[CandidateBudget]] exactly
  * as d01/d02 do (same (key, mass) shape — deliberately not baked
  * in here so the exact join stays exact by default).
  *
  * Threshold is fixed at 1: depth-d deletion neighborhoods grow
  * C(L,d)-fold, and the d=1 join is the lossless building block
  * (SymSpell composes larger thresholds from it recursively).
  */
object EditDistanceJoin {

  /** All unordered pairs of `df` rows whose `str` values are within
    * Levenshtein distance 1, as (a_key, b_key, a_str, b_str, dist)
    * with a_key < b_key. `key` must be unique per row. */
  def pairs(df: DataFrame, key: String, str: String): DataFrame = {
    val base = df.select(col(key).as("k"), col(str).as("nm"))
    // deletion variants: substr(nm,1,i-1) || substr(nm,i+1) for every
    // position i (guarded: an empty string has only its identity
    // variant — and Spark's sequence(1,0) would DESCEND, not empty)
    val dels = base.where(length(col("nm")) >= 1)
      .select(col("k"), col("nm"),
        explode(expr("sequence(1, length(nm))")).as("i"))
      .select(col("k"), col("nm"),
        concat(expr("substring(nm, 1, i - 1)"),
          expr("substring(nm, i + 1, length(nm))")).as("v"))
    // variant SETS, not lists: deleting any position of an equal-char
    // run yields the SAME variant ("…0001" has one distinct deletion
    // for its whole zero run, not eight), and duplicate variants
    // multiply the join output quadratically — measured 2.6× on the
    // run-heavy TPC-H names. (k, v) → nm is functional, so the
    // distinct loses nothing.
    val variants = base.select(col("k"), col("nm"), col("nm").as("v"))
      .unionAll(dels)
      .distinct()
    // distinct column names on each side: a self-join keyed through
    // the SAME attribute resolves to a trivially-true predicate
    // (Spark's self-join ambiguity) and silently degrades the
    // equi-join into a filtered cartesian
    val a = variants
      .select(col("k").as("a_key"), col("nm").as("a_str"), col("v").as("av"))
    val b = variants
      .select(col("k").as("b_key"), col("nm").as("b_str"), col("v").as("bv"))
    a.join(b, col("av") === col("bv") && col("a_key") < col("b_key"))
      .select("a_key", "b_key", "a_str", "b_str")
      .distinct()
      // thresholded verify: -1 means "exceeds 1", computed with the
      // banded early-exit instead of the full DP matrix
      .withColumn("dist",
        levenshtein(col("a_str"), col("b_str"), 1).cast("long"))
      .where(col("dist") >= 0L)
  }
}
