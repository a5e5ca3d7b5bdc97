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
  * Thresholds 1 and 2 are supported — the RECURSIVE deletion
  * neighborhood (SymSpell's public composition: depth-2 variants are
  * single deletions OF the single deletions). The same alignment
  * argument generalizes losslessness: for ed(a,b) ≤ t, delete from
  * each side the ≤ t positions its edit operations touch in an
  * optimal alignment and both reach a common variant at depth ≤ t —
  * so depth-t neighborhoods overlap, candidates stay a superset, and
  * the thresholded verify keeps the join exact (spec-pinned against
  * all-pairs at BOTH thresholds). Depth d costs C(L,d)-fold variant
  * fan-out and shorter (more collision-prone) variants — threshold 2
  * is where the curve is still friendly for short key fields;
  * anything deeper should cluster instead.
  */
object EditDistanceJoin {

  /** All unordered pairs of `df` rows whose `str` values are within
    * Levenshtein distance `maxDist` (1 or 2), as (a_key, b_key,
    * a_str, b_str, dist) with a_key < b_key. `key` must be unique
    * per row.
    *
    * WIDE shape deliberately: the strings ride the variant self-join
    * so candidates emerge verify-ready with no further shuffle. The
    * width trade (measured at the 100× replica): unbudgeted
    * candidate mass is of the same order as — or larger than — the
    * variant frame, so re-attaching strings to candidates would cost
    * two candidate-mass exchanges + sorts (~2× end-to-end here),
    * while the wide variant rows cost only the extra string bytes in
    * the one existing exchange. [[pairsBudgeted]] makes the OPPOSITE
    * choice for the same reason reversed: its admitted candidates
    * are budget-bounded below the variant mass. */
  def pairs(df: DataFrame, key: String, str: String,
      maxDist: Int = 1): DataFrame = {
    // Par.widen: the variant explode is length(nm)-fold CPU on a
    // byte-small scan — a single-split input serializes it (guide §2)
    val base = graft.functions.Par.widen(
      df.select(col(key).as("k"), col(str).as("nm")))
    // one explicit v-keyed exchange both self-join sides share
    // (ReusedExchange) — without it each side plans its own shuffle
    // of the wide variant frame and the explode lineage runs twice
    val variants = variantsOf(base, maxDist, carryNm = true)
      .repartition(col("v"))
    val a = variants
      .select(col("k").as("a_key"), col("nm").as("a_str"), col("v").as("av"))
    val b = variants
      .select(col("k").as("b_key"), col("nm").as("b_str"), col("v").as("bv"))
    a.join(b, col("av") === col("bv") && col("a_key") < col("b_key"))
      .select("a_key", "b_key", "a_str", "b_str")
      .distinct()
      .withColumn("dist",
        levenshtein(col("a_str"), col("b_str"), maxDist).cast("long"))
      .where(col("dist") >= 0L)
  }

  /** [[pairs]] under the d01 CANDIDATE-BUDGET discipline — for
    * corpora whose variants are boilerplate-shared (shared prefixes,
    * zero-padded keys), where depth-2 buckets go quadratic: bucket
    * pair mass C(n,2) is counted FIRST on the variant string, buckets
    * admit cheapest-first within `budget` via
    * [[CandidateBudget.admit]], the hot tail is pruned by a
    * left_anti, and the skipped mass is DISCLOSED in a
    * `skipped_candidates` column appended to every output row.
    * Cheapest-first keeps recall where linkage lives (a typo pair
    * shares a rare variant; the hot buckets are the boilerplate
    * crowd). A budget covering everything returns exactly [[pairs]]
    * plus a zero disclosure column (spec-pinned).
    *
    * COST FLOOR (disclosed here because the budget does NOT cap it):
    * the depth-2 variant frame itself is Σ C(len,≤2) rows per name —
    * ~136M rows at the 100× replica (the dominant term of d19's
    * 233 s cold receipt, BENCH_SCALE `round11_replica_correction`) —
    * and it must be enumerated IN FULL before any bucket can be
    * counted: the budget bounds the quadratic candidate-PAIR mass,
    * which is the term that explodes super-linearly, while the
    * variant mass is linear in corpus bytes (len² per name, bounded
    * by name length) and is the price of the SymSpell recall
    * guarantee — capping it would silently drop candidate pairs with
    * NO disclosed mass, the one failure mode this operator exists to
    * prevent. Linear-by-design, not free: size executors for
    * O(len²·N) explode throughput, not O(N). */
  def pairsBudgeted(df: DataFrame, key: String, str: String,
      maxDist: Int, budget: Long): DataFrame = {
    val base = graft.functions.Par.widen(
      df.select(col(key).as("k"), col(str).as("nm")))
    // the budget machinery makes the variant frame feed FOUR
    // consumers (the mass count, admit's own evaluation, and both
    // candidate-join sides) through four DIFFERENT exchanges —
    // uncached, the explode+distinct lineage would run four times
    // (measured 9.2 s -> ~4 s on d19 at sf0.1). Columnar
    // MEMORY_AND_DISK cache, same contract as d06's signature cache:
    // materializes on first use, shared by every consumer of the
    // returned lazy frame, RETAINED for the session — the
    // Verify/Bench harnesses clearCache() between queries, and a
    // long-lived service embedding this operator should do the same.
    // repartition by the variant BEFORE caching: every consumer below
    // is v-keyed (the mass aggregate, the anti-join prune, both
    // candidate-join sides), so baking HashPartitioning(v) into the
    // cached blocks lets all of them read the cache exchange-free —
    // the union's natural layout would force each consumer to
    // re-shuffle the full variant mass on its own.
    val variants = variantsOf(base, maxDist)
      .repartition(col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mass = variants.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .select(col("v"), expr("(n * (n - 1)) div 2").as("cand"))
      .where(col("cand") > 0)
    val adm = CandidateBudget.admit(mass, Seq("v"), budget)
    val kept = variants.join(adm.skippedKeys, Seq("v"), "left_anti")
    joined(base, kept, maxDist).crossJoin(broadcast(adm.skippedMass))
  }

  /** The deletion-neighborhood variant frame: one row per DISTINCT
    * variant of each input row — (k, v), or (k, nm, v) when
    * `carryNm` (the [[pairs]]/[[pairsBudgeted]] width trade: the
    * wide rows make candidates verify-ready in the self-join's own
    * exchange; the narrow rows halve the high-volume frame when the
    * budget bounds candidates below it). */
  private def variantsOf(base: DataFrame, maxDist: Int,
      carryNm: Boolean = false): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      "maxDist must be 1 or 2 — depth-d neighborhoods grow C(L,d)-" +
        "fold; compose deeper thresholds by clustering instead")
    val carry = if (carryNm) Seq(col("k"), col("nm")) else Seq(col("k"))
    // deletion variants: substr(from,1,i-1) || substr(from,i+1) for
    // every position i (guarded: an empty string has only its
    // identity variant — and Spark's sequence(1,0) would DESCEND,
    // not empty)
    def delOnce(in: DataFrame): DataFrame = in
      .where(length(col("v")) >= 1)
      .select(carry ++ Seq(
        explode(expr("sequence(1, length(v))")).as("i"), col("v")): _*)
      .select(carry :+
        concat(expr("substring(v, 1, i - 1)"),
          expr("substring(v, i + 1, length(v))")).as("v"): _*)
    // variant SETS, not lists, at EVERY depth: deleting any position
    // of an equal-char run yields the SAME variant ("…0001" has one
    // distinct deletion for its whole zero run, not eight), and
    // duplicate variants multiply the join output quadratically —
    // measured 2.6× on the run-heavy TPC-H names; at depth 2 the
    // depth-1 dedup ALSO shrinks the second explode's input. (k, v)
    // → nm is functional, so the distincts lose nothing.
    //
    // Dedup runs PER DEPTH, never over the union: for one key, every
    // depth-d variant has length L−d, so the identity/depth-1/depth-2
    // sets are pairwise disjoint and their union is already a set —
    // a trailing union-wide distinct would re-shuffle the entire
    // variant frame (identity + d1 + d2 mass) to remove nothing.
    val identity = base.select(carry :+ col("nm").as("v"): _*)
    val d1 = delOnce(identity).distinct()
    if (maxDist == 1) identity.unionAll(d1)
    else identity.unionAll(d1).unionAll(delOnce(d1).distinct())
  }

  /** Candidate join over the narrow variant frame + thresholded
    * verify with the strings re-attached from `names` (k, nm): the
    * candidate pair frame is bounded (by the corpus' true collision
    * structure, or by the budget on the budgeted path), so the two
    * name-fetch joins shuffle candidate-scale rows against the
    * names, never the variant fan-out. */
  private def joined(names: DataFrame, variants: DataFrame,
      maxDist: Int): DataFrame = {
    // distinct column names on each side: a self-join keyed through
    // the SAME attribute resolves to a trivially-true predicate
    // (Spark's self-join ambiguity) and silently degrades the
    // equi-join into a filtered cartesian
    val a = variants.select(col("k").as("a_key"), col("v").as("av"))
    val b = variants.select(col("k").as("b_key"), col("v").as("bv"))
    a.join(b, col("av") === col("bv") && col("a_key") < col("b_key"))
      .select("a_key", "b_key")
      .distinct()
      .join(names.select(col("k").as("a_key"), col("nm").as("a_str")), "a_key")
      .join(names.select(col("k").as("b_key"), col("nm").as("b_str")), "b_key")
      // thresholded verify: -1 means "exceeds maxDist", computed with
      // the banded early-exit instead of the full DP matrix
      .withColumn("dist",
        levenshtein(col("a_str"), col("b_str"), maxDist).cast("long"))
      .where(col("dist") >= 0L)
      .select("a_key", "b_key", "a_str", "b_str", "dist")
  }
}
