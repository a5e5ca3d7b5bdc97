package graft.operators

import org.apache.spark.sql.DataFrame

/** INCREMENTAL VIEW MAINTENANCE FOR JOINS — the member the IVM
  * family was missing: [[IncrementalRollup]] maintains aggregates
  * under CDC, d11 maintains DISTINCT, but a materialized JOIN view
  * (the enriched fact table every warehouse keeps: lineitem ⋈
  * orders, events ⋈ dim) was only maintainable by full recompute —
  * the reference's own daily pattern (`TransformTaxiTrips.py`
  * rebuilds its joined views from the whole history every run).
  *
  * The classic delta algebra (Blakeley et al. 1986, "Efficiently
  * Updating Materialized Views" — the public result every IVM engine
  * builds on), for APPEND-ONLY deltas under bag semantics:
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B₀  ∪ₐₗₗ  A₀ ⋈ ΔB  ∪ₐₗₗ  ΔA ⋈ ΔB
  *
  * — three joins whose EVERY term has a delta side, so maintenance
  * cost is O(|Δ| · join fan-out), never O(|A ⋈ B|); the old view is
  * untouched and the new view is `old ∪ₐₗₗ delta`. Bag semantics
  * make this EXACT (unionAll, no dedup — duplicate fact rows stay
  * duplicated, matching the full recompute bit-for-bit; spec-pinned
  * for arbitrary splits). Deletes/updates need retraction pairs —
  * that is [[SnapshotMerge.changeFeed]]'s job; compose its
  * update_preimage/postimage rows as (retract, add) deltas.
  *
  * Scale shape: the two cross-generation legs shuffle the DELTA
  * against the base on the join key — with a date-partitioned or
  * bucketed base (D16) the base side reads only delta-adjacent
  * partitions ([[SnapshotMerge.pruneToTouchedPartitions]]), and the
  * ΔA ⋈ ΔB leg is delta-sized on both sides. Nothing in the plan
  * scales with |A ⋈ B|. */
object IncrementalJoin {

  /** The delta rows of `A ⋈keys B` contributed by append-only
    * deltas `dA` and `dB` against the pre-append generations `aOld`
    * and `bOld`. New view = old view unionAll this. */
  def joinDelta(aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    dA.join(bOld, keys)
      .unionByName(aOld.join(dB, keys))
      .unionByName(dA.join(dB, keys))
}
