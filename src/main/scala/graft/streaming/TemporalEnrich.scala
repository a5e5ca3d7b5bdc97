package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING TEMPORAL (AS-OF) DIMENSION JOIN — the versioned-dim
  * upgrade of the reference's stream–static enrich
  * (`StreamingTaxiTrips.py:34-41` joins the CURRENT areas master into
  * every event): when the dimension CHANGES over time (an SCD2
  * history — D17/d14's product), each event must join the version
  * valid AT ITS OWN EVENT TIME, not whichever row is current when the
  * micro-batch happens to run — otherwise a replayed/late event is
  * enriched differently than it was live, and reprocessing a day
  * yields different rows than the original run (the
  * correctness-under-replay property event-time processing exists
  * for). This is Flink's temporal table join / the AS OF join of the
  * versioned-dim warehouses — public shapes — expressed Spark-first:
  *
  *   - the KERNEL ([[enrich]]) is a plain left join with an equi key
  *     plus the validity range residual — one shared function, so the
  *     batch backfill and the stream enrich the SAME way (the
  *     reference's P1 ≡ P2 cleaning-parity rule applied to
  *     enrichment);
  *   - the STREAMING face is the same call on a streaming frame:
  *     stream–static joins are stateless and re-planned per
  *     micro-batch, and the equi key keeps the plan a HASH join with
  *     a range residual — never a nested-loop over the batch
  *     (spec-pinned in BOTH regimes). The dim side is NOT
  *     force-broadcast (the r10 verdict: the same kernel serves SCD2
  *     histories whose key-count × version-count reaches tens of
  *     millions of rows, where a forced hint bypasses the planner's
  *     size check and OOMs the driver — the identical fix already
  *     applied to Governance.kAnonymize): a small dim (the
  *     reference's 77-row areas master) still auto-broadcasts off
  *     its own size stats, and a large one degrades to a shuffled
  *     hash/sort-merge join per micro-batch instead of a driver OOM.
  *
  * Contract: `dim` carries `valid_from`/`valid_to` (half-open
  * [valid_from, valid_to); NULL valid_to = current version) and at
  * most one valid version per (key, instant) — the SCD2 invariant —
  * so each event matches ≤ 1 row and no post-join dedup exists to
  * hide a broken history. Events with no valid version (before the
  * key existed, unknown key) pass through with NULL dim columns —
  * the LEFT join the batch backfill needs; a gating consumer filters
  * after. */
object TemporalEnrich {

  /** Left-join each event to the dim version valid at the event's own
    * `ts`. Output = event columns ++ dim payload columns (validity
    * bounds and the duplicated key are dropped). Works identically on
    * batch and streaming frames. */
  def enrich(events: DataFrame, ts: String, dim: DataFrame,
      key: String): DataFrame = {
    require(dim.columns.contains("valid_from") && dim.columns.contains("valid_to"),
      "temporal dim must carry valid_from/valid_to (SCD2 half-open intervals)")
    val payload = dim.columns
      .filterNot(Seq(key, "valid_from", "valid_to").contains).toSeq
    val clash = payload.toSet & events.columns.toSet
    require(clash.isEmpty,
      s"dim payload columns ${clash.mkString(", ")} exist on the event " +
        "side too; rename them first")
    val d = dim.select(col(key).as("__dim_key") +:
      (Seq("valid_from", "valid_to") ++ payload).map(col): _*)
    events.join(d,
      events(key) === col("__dim_key") &&
        events(ts) >= col("valid_from") &&
        (col("valid_to").isNull || events(ts) < col("valid_to")),
      "left")
      .drop("__dim_key", "valid_from", "valid_to")
  }
}
