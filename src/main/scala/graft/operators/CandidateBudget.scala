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
  * Scale: the cumulative sum is computed as a TWO-PASS
  * range-partitioned prefix sum (see [[admit]]) — no task ever sees
  * more than its range slice of the bucket-mass rows, so the
  * admission scales with the bucket list (corpus-bound for d01's
  * mod-P signatures) instead of funneling it through one window
  * task; the admitted keyset is broadcast into a left-semi prune by
  * the caller.
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
    * The cumulative sum over the (cand, keys…) total order is a
    * TWO-PASS RANGE-PARTITIONED PREFIX SUM — the distributed shape of
    * a running total, replacing round 7's global unpartitioned window
    * (a single task funnel once the bucket list is corpus-bound, as
    * d01's mod-P signatures make it):
    *
    *  1. range-partition the mass rows by the total order, so
    *     partition i holds a contiguous order slice, and capture the
    *     partition id as a column;
    *  2. collect the PER-PARTITION mass totals (one row per shuffle
    *     partition — CLUSTER-WIDTH-bounded, never data-bounded),
    *     fold them into exclusive prefix offsets on the driver, and
    *     broadcast-join them back;
    *  3. run the cumulative window PER PARTITION ID — every window
    *     task sees only its slice — and add the slice's offset.
    *
    * No task anywhere sees more than its range slice of the DATA,
    * and the driver sees ≤ one row per partition — the textbook
    * distributed prefix-sum shape.
    *
    * The (keys…, cand, cum) result is MATERIALIZED EAGERLY
    * (localCheckpoint) while the ranged frame is pinned, and the pin
    * is released before admit returns. This is a correctness rule,
    * not a convenience (the r8 advice): the broadcast offsets are
    * keyed to ONE physical instance of the range exchange, and a
    * lazy consumer that recomputed it later — after cache eviction,
    * under a different AQE coalesce decision upstream — could see
    * drifted partition ids and silently mis-keyed offsets. With the
    * checkpoint, no consumer can ever recompute the exchange: the
    * keep/skip frames are narrow filters over an immutable
    * materialized slice set (losing an executor fails the job loudly
    * instead of corrupting cum), and the per-admission cache entry is
    * explicitly unpersisted instead of leaking until LRU pressure.
    * The checkpointed frame is kilobytes — aggregated bucket rows,
    * never pairs.
    *
    * cum values are bit-identical to the global window's because
    * (cand, keys…) is a total order (mass rows are groupBy results,
    * so no composite key repeats — no tie can straddle a range
    * boundary ambiguously). CandidateBudgetSpec pins admissions
    * bit-equal to a single-task reference and pins the internal
    * frame's plan (every window keyed by the range-slice id, offsets
    * broadcast); QueryPlanSpec pins that d01/d02/d06 final plans
    * carry NO admission window at all — the prefix sum ran in its
    * own bounded job. */
  def admit(mass: DataFrame, keys: Seq[String],
      budget: Long): Admission = {
    val keyCols = keys.map(col)
    val (ranged, budgeted) = budgetedFrame(mass, keys)
    // one eager job: materialize (keys…, cand, cum) while the ranged
    // instance the offsets were collected from is still pinned. The
    // kilobyte result funnels into ONE block via a tiny exchange
    // (repartition, not coalesce — coalesce(1) would collapse the
    // window stage itself to a single task) so the checkpoint and
    // every consumer read touch one partition, not cluster-width
    val admitted = budgeted
      .select(keyCols :+ col("cand") :+ col("cum"): _*)
      .repartition(1)
      .localCheckpoint(true)
    ranged.unpersist()
    val keep = admitted.where(col("cum") <= budget).select(keyCols: _*)
    val skippedKeys = admitted.where(col("cum") > budget).select(keyCols: _*)
    val skippedMass = admitted
      .agg(coalesce(sum(when(col("cum") > budget, col("cand"))), lit(0L))
        .as("skipped_candidates"))
    Admission(keep, skippedKeys, skippedMass)
  }

  /** The lazy two-pass prefix-sum frame: (ranged-and-pinned input,
    * budgeted rows with cum). Package-private so the spec can pin the
    * plan shape; every production caller goes through [[admit]],
    * which materializes and releases the pin. */
  private[graft] def budgetedFrame(mass: DataFrame,
      keys: Seq[String]): (DataFrame, DataFrame) = {
    val s = mass.sparkSession
    val keyCols = keys.map(col)
    val order = col("cand") +: keyCols
    // EXPLICIT partition count: an N-less repartitionByRange is an
    // AQE-coalescible exchange, and a different coalesce decision
    // would shift spark_partition_id and mis-key the offsets;
    // REPARTITION_BY_NUM is exempt from coalescing. The pre-sort
    // canonicalizes the range sampler's input (reservoir sampling
    // reads rows in partition order). Both matter only WITHIN the
    // admission's own pinned lifetime now — the checkpoint removes
    // every cross-job re-evaluation.
    val nParts = s.sessionState.conf.numShufflePartitions
    val ranged = mass.sortWithinPartitions(order: _*)
      .repartitionByRange(nParts, order: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition totals → exclusive prefix offsets (driver
    // side, ≤ one row per shuffle partition)
    val totals = ranged.groupBy(col("_pid")).agg(sum(col("cand")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) {
      case ((_, acc), (pid, t)) => (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    import s.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    // pass 2: per-partition running sums under broadcast offsets
    val wCum = Window.partitionBy(col("_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budgeted = ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn("cum", col("_off") + sum(col("cand")).over(wCum))
    (ranged, budgeted)
  }
}
