package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TOP-K (heavy-hitter) rollup — the FIFTH mergeable summary algebra
  * in the library, answering the one dashboard question the others
  * cannot: WHO are the heaviest contributors over an arbitrary day
  * range, with a sound error bar. [[SketchRollup]] counts distinct,
  * [[HistogramRollup]] bins values, [[KmvRollup]] intersects
  * identity sets, [[CmsRollup]] point-estimates one key's frequency
  * — none can RANK keys without a full scan. The public design is
  * the truncated per-segment top list every analytics store ships
  * (Druid topN's per-segment tops; the Misra-Gries/SpaceSaving bound
  * argument): per (day, event_type) cell keep the top-[[B]] users by
  * event count (ties broken by user id — fully deterministic) plus
  * the cell's TAIL CEILING (the count of the first EXCLUDED user),
  * and any range query merges additively:
  *
  *   - lower bound lb(u) = Σ kept counts — true events of u
  *     contributed by days that kept u, so lb ≤ true;
  *   - upper bound ub(u) = lb(u) + Σ tail over the range's cells
  *     where u was NOT kept — a day that dropped u saw at most its
  *     tail ceiling from u (counts are sorted: excluded ⟹ count ≤
  *     first-excluded), so true ≤ ub. A cell that kept EVERYONE has
  *     tail 0 and the bound is exact.
  *
  * The sandwich lb ≤ true ≤ ub is spec-pinned against exact
  * recomputation, ranking is by (lb DESC, user) — a total order —
  * and everything is integer counts, so the DuckDB oracle replays
  * build and merge CTE-for-CTE.
  *
  * Scale shape: ≤ B+1 rows per (day, event_type, segment) cell —
  * kilobytes per cell at any corpus size; the build's per-cell rank
  * runs under WindowGroupLimit (heap-bounded per partition,
  * spec-pinned); range reads touch ONLY the summary table
  * (plan-pinned scan-free). [[appendBatch]] adds the batch's own
  * summary as a NEW SEGMENT of its days: truncated tops are not
  * losslessly re-mergeable within a day (the counts were split), but
  * segment bounds ADD — lb sums kept counts across segments, the
  * tail ceiling sums across segments — so bounds stay sound under
  * any append pattern and merely widen (spec-pinned); rebuilding
  * (reEnsure-style) re-tightens them. */
object TopKRollup {

  /** Kept users per cell. 64 keeps a cell ≤ 65 rows while bounding
    * the absent-user ceiling at the 65th count. */
  val B = 64

  def topkPath(dir: String): String =
    s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/topk_daily"

  /** Per-batch summary rows (day, seg, event_type, user_id, c, tail):
    * top-B users per cell by (count DESC, user) with the first
    * excluded count as the cell's shared tail ceiling. */
  private[graft] def summarize(batch: DataFrame, seg: Long): DataFrame = {
    val counts = batch.select(
        MinMaxManifest.utcDay(col("ts")).as("day"),
        col("event_type"), col("user_id"))
      .groupBy(col("day"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("day"), col("event_type"))
      .orderBy(col("c").desc, col("user_id"))
    // rn <= B+1 keeps the rank under WindowGroupLimit; row B+1 only
    // donates the cell's tail ceiling and is not a kept user
    val ranked = counts.withColumn("rn", row_number().over(w))
      .where(col("rn") <= B + 1)
    val tails = ranked.where(col("rn") === B + 1)
      .select(col("day").as("td"), col("event_type").as("tt"),
        col("c").as("tail"))
    ranked.where(col("rn") <= B)
      .join(tails, col("day") === col("td") && col("event_type") === col("tt"),
        "left")
      .select(col("day"), lit(seg).as("seg"), col("event_type"),
        col("user_id"), col("c"), coalesce(col("tail"), lit(0L)).as("tail"))
  }

  /** Build the daily summary table once per corpus lifetime
    * (segment 0). */
  def ensure(s: SparkSession, dir: String): Unit = {
    val path = topkPath(dir)
    if (IndexStore.artifactReady(path)) return
    summarize(graft.Tables(s, dir, "events"), 0L)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Append a batch as a NEW SEGMENT (caller supplies a unique
    * batchId — the foreachBatch id in a streaming leg): O(batch)
    * work, summary never rewritten, bounds stay sound and widen by
    * at most the batch's own tails (see scaladoc). */
  def appendBatch(s: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): Unit = {
    require(IndexStore.artifactReady(topkPath(dir)),
      s"top-k summary at ${topkPath(dir)} must be built before appending")
    require(batchId != 0L, "segment 0 is the ensure() build")
    summarize(batch, batchId)
      .coalesce(1).write.mode("append").parquet(topkPath(dir))
  }

  /** Batch-id-scoped streaming leg — the exactly-once discipline the
    * sum-merge rollups established ([[HistogramRollup
    * .processStreamBatch]]): each micro-batch's summary lands as its
    * own `batch=b<id>` partition (a replayed batch OVERWRITES itself,
    * never double-counts) and serves as one more additive SEGMENT —
    * the bound algebra needs nothing else. Deletes are NOT
    * subtractable from a truncated top (a dropped user's kept counts
    * are unknown), so the CDC-delete repair path is a rebuild, not a
    * patch. */
  def streamPath(dir: String): String = topkPath(dir) + "_stream"

  def processStreamBatch(s: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): Unit = {
    ensure(s, dir)
    // NEGATIVE segment ids: disjoint from appendBatch's positive ones
    // by construction, so a (day, seg, type, tail) cell can never
    // collide across the two legs and silently dedupe a tail ceiling
    summarize(batch, -(batchId + 1L)).coalesce(1).write.mode("overwrite")
      .parquet(s"${streamPath(dir)}/batch=b$batchId")
  }

  /** Heavy-hitter candidates per event_type over [lo, hi): every
    * user kept by ≥ 1 cell, with the sound bounds
    * (event_type, user_id, lb, ub), ranked (lb DESC, user) and cut
    * to `topN` per type. Touches only the summary table (plus any
    * committed stream-batch segments — the [[IndexStore
    * .readyBatches]] rule: a torn batch contributes nothing until
    * its replay overwrites it). */
  def heavyHitters(s: SparkSession, dir: String, lo: String, hi: String,
      topN: Int = 5): DataFrame = {
    ensure(s, dir)
    val ready = IndexStore.readyBatches(streamPath(dir))
    val baseCells = s.read.parquet(topkPath(dir))
    val allCells =
      if (ready.isEmpty) baseCells
      else baseCells.unionByName(
        s.read.parquet(ready.map(t => s"${streamPath(dir)}/$t"): _*)
          .select("day", "seg", "event_type", "user_id", "c", "tail"))
    val cells = allCells
      .where(col("day") >= lit(MinMaxManifest.utc(lo)) &&
        col("day") < lit(MinMaxManifest.utc(hi)))
    // one tail ceiling per (day, seg, type) cell; total per type
    val totalTail = cells.select("day", "seg", "event_type", "tail")
      .distinct()
      .groupBy(col("event_type")).agg(sum(col("tail")).as("total_tail"))
    val perUser = cells.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("c")).as("lb"), sum(col("tail")).as("kept_tail"))
    val bounded = perUser.join(totalTail, Seq("event_type"))
      .select(col("event_type"), col("user_id"), col("lb"),
        (col("lb") + col("total_tail") - col("kept_tail")).as("ub"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("lb").desc, col("user_id"))
    bounded.withColumn("rn", row_number().over(w))
      .where(col("rn") <= topN).drop("rn")
  }
}
