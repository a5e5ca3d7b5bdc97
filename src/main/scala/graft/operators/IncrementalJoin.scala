package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Maintain a KEYED join view under UPSERTS AND DELETES of the A
    * side, fed by [[SnapshotMerge.changeFeed]]'s rows — the
    * retract/add composition the scaladoc above promises, made
    * concrete: `aKey` identifies A's rows (one live A-row per key —
    * the snapshot invariant the feed itself maintains), so a
    * retraction is a KEY removal (never a multiset subtract, which
    * general bag IVM would need counts for):
    *
    *   - `delete` / `update_preimage` rows retract: every view row
    *     carrying that aKey leaves (one anti-join on the feed's key
    *     set — NOT force-broadcast: a change-sized key set still
    *     auto-broadcasts off its own size stats, while a bulk feed —
    *     a GDPR sweep, a backfill replaying 10⁸ retractions —
    *     degrades to a shuffled anti-join instead of bypassing the
    *     planner's size check and OOMing the driver, the identical
    *     fix already applied to Governance.kAnonymize and
    *     TemporalEnrich);
    *   - `insert` / `update_postimage` rows add: the new A-rows join
    *     B once — O(changes · fan-out).
    *
    * Cost O(|feed|), never O(|view|) shuffle mass beyond the
    * anti-join probe of the view itself — and with a PARTITIONED
    * view even that probe is bounded: [[applyFeedPartitioned]]
    * confines the anti-join to the delta-adjacent partitions and
    * passes every other partition through untouched. Spec pins
    * maintained ≡ recomputed across mixed insert/update/delete
    * batches, and the anti-join's hash (never nested-loop) shape in
    * both size regimes. */
  def applyFeed(view: DataFrame, feed: DataFrame, b: DataFrame,
      aKey: String, joinKeys: Seq[String]): DataFrame = {
    val gone = feed
      .where(col("_change_type").isin("delete", "update_preimage"))
      .select(col(aKey)).distinct()
    val added = feed
      .where(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
      .join(b, joinKeys)
    // a using-key anti-join moves aKey to the front; restore the
    // view's own column order so maintained output ≡ view schema
    view.join(gone, Seq(aKey), "left_anti")
      .select(view.columns.map(col).toSeq: _*)
      .unionByName(added, allowMissingColumns = false)
  }

  /** [[applyFeed]] for a view PARTITIONED on `partitionCol` (a
    * date-partitioned enriched fact table — the standing shape): the
    * retraction anti-join probes ONLY the partitions the feed's
    * preimage rows name, and every other partition passes through
    * with no join at all — so on a 1000-partition view a one-day
    * feed's maintenance reads one partition's rows into the
    * anti-join, not the corpus (the view-side composition of
    * [[SnapshotMerge.pruneToTouchedPartitions]]; PartitionFilters on
    * the view scan are spec-pinned).
    *
    * Sound because a view row's `partitionCol` comes from its A-side
    * row, and the feed's delete/update_preimage rows ARE those
    * A-rows — a retracted key can only live in a partition the feed
    * names. Rows with a NULL partition value are conservatively
    * probed too. The touched-partition value list is change-sized
    * (collected to the driver, like every partition-pruning path
    * here). Maintained output ≡ [[applyFeed]]'s, spec-pinned. */
  def applyFeedPartitioned(view: DataFrame, feed: DataFrame, b: DataFrame,
      aKey: String, joinKeys: Seq[String], partitionCol: String): DataFrame = {
    require(feed.columns.contains(partitionCol),
      s"feed must carry the view partition column $partitionCol " +
        "(preimage rows do — they are the retracted A-rows)")
    val retractions = feed
      .where(col("_change_type").isin("delete", "update_preimage"))
    val gone = retractions.select(col(aKey)).distinct()
    val parts = retractions.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)).filter(_ != null).toSeq
    val touchedCond =
      if (parts.isEmpty) col(partitionCol).isNull
      else col(partitionCol).isInCollection(parts) || col(partitionCol).isNull
    val ordered = view.columns.map(col).toSeq
    // touchedCond is never three-valued (isNull catches the null
    // rows), so !touchedCond is exactly the complement partition set
    val kept = view.where(touchedCond)
      .join(gone, Seq(aKey), "left_anti").select(ordered: _*)
      .unionByName(view.where(!touchedCond).select(ordered: _*))
    val added = feed
      .where(col("_change_type").isin("insert", "update_postimage"))
      .drop("_change_type")
      .join(b, joinKeys)
    kept.unionByName(added, allowMissingColumns = false)
  }
}
