package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cheapest-first candidate-mass budgeting for banded/blocked
  * candidate generation — the discipline that converts every LSH
  * family's structural quadratic (k docs sharing a band signature ⇒
  * k² candidate pairs; real corpora have boilerplate-heavy skew even
  * when synthetic data doesn't) into bounded linear work plus a
  * DISCLOSED recall trade.
  *
  * Contract (shared by d01's MinHash buckets and d02/d06's SimHash
  * multi-probe buckets, and mirrored CTE-for-CTE in their oracles):
  * count each bucket's candidate mass FIRST (counts only — never
  * materialize pairs to count them), then admit buckets in ascending
  * (mass, key…) order until the global budget is spent; the remainder
  * is skipped and its mass is surfaced to the caller for the
  * `skipped_candidates` output column. Cheapest-first maximizes
  * admitted bucket count (true near-dup pairs live in small buckets —
  * a near-dup's signature is shared by its twin, not by the random
  * crowd), and (mass, key…) is a total order so the admitted set is
  * fully deterministic.
  *
  * Scale: the cumulative window is GLOBAL but runs over bucket-mass
  * rows, whose count is bounded by the KEY SPACE (bands × signature
  * domain), not the corpus; the admitted keyset is broadcast into a
  * left-semi prune by the caller.
  */
object CandidateBudget {

  /** The admit decision over a bucket-mass frame. `keep` and
    * `skippedKeys` partition the input keys; `skippedMass` is exactly
    * one row (column `skipped_candidates`). Callers whose bucket
    * count is key-space-bounded (d02/d06) broadcast `keep` into a
    * left_semi; callers whose bucket count is corpus-bound (d01 —
    * mod-P signatures make the key space effectively unbounded)
    * pre-filter to POSITIVE-mass buckets (a zero-mass bucket neither
    * consumes budget nor yields a pair, so dropping it changes
    * nothing) and left_anti on `skippedKeys`, which is only the hot
    * tail. */
  final case class Admission(keep: DataFrame, skippedKeys: DataFrame,
      skippedMass: DataFrame)

  /** Admit buckets of `mass` (key columns ++ a `cand` mass column)
    * cheapest-first within `budget`.
    *
    * The cumulative window is a GLOBAL total order — one task sees
    * every input row. That is sound while the input is bounded (d02:
    * key space; d01: positive-mass buckets ≈ the corpus's duplicate
    * groups + band collisions, each contributing 1 row per band, not
    * its members); at a corpus where even THAT list outgrows a task,
    * the exact same semantics come from a two-pass range-partitioned
    * prefix sum (per-partition totals collected — one row per
    * partition — then per-partition windows with broadcast offsets),
    * noted here as the swap-in rather than built, because the window
    * input at every measured scale is thousands of rows. */
  def admit(mass: DataFrame, keys: Seq[String],
      budget: Long): Admission = {
    val keyCols = keys.map(col)
    val order = col("cand") +: keyCols
    val wCum = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgeted = mass.withColumn("cum", sum(col("cand")).over(wCum))
    val keep = budgeted.where(col("cum") <= budget).select(keyCols: _*)
    val skippedKeys = budgeted.where(col("cum") > budget).select(keyCols: _*)
    val skippedMass = budgeted
      .agg(coalesce(sum(when(col("cum") > budget, col("cand"))), lit(0L))
        .as("skipped_candidates"))
    Admission(keep, skippedKeys, skippedMass)
  }
}
