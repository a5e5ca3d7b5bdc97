package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ENTITY-KEYED SERVING INDEX (D86) — the record-level secondary
  * index / feature-store pattern (Hudi's record index, Pinot's
  * star-tree entity rollups, every user-profile store — public
  * designs): the routing rollups (D50/D57/D81) serve TIME-keyed
  * dashboards; this table serves ENTITY-keyed point lookups — "user
  * 17's event count, value total, active days" — which at 100 TB
  * must never scan the fact table. The store is one row per
  * (user, UTC day) with summable partials, hash-partitioned into
  * [[Buckets]] directories by a deterministic key bucket, so a
  * point lookup for k users reads ≤ k partition directories of a
  * corpus-independent-width table: kilobytes, via Spark's partition
  * pruning (`PartitionFilters` on `bucket` — spec-pinned by
  * counting the files the serve plan actually touches).
  *
  * Day grain (not lifetime totals) because (a) distinct-day counts
  * are then exact under append merging (duplicate (user, day) rows
  * fold by SUM / re-distinct), and (b) the serve can answer
  * windowed profiles ("active days in January") from the same
  * artifact — the lattice argument of D81, applied to entities.
  *
  * Bucket function: `floorMod(user_id, Buckets)` — deterministic
  * and driver-replayable, so the lookup computes its target buckets
  * without a Spark job. A deployment whose entity ids are assigned
  * sequentially (ids correlate with signup time, not activity)
  * keeps uniform bucket mass by construction; ids with adversarial
  * structure would hash first (xxhash64 % B) at the cost of a
  * driver-side hash replica. Documented trade, same family as
  * [[GraphRank]]'s bucket count.
  *
  * Lifecycle = the [[AggRollup]]/[[EnsureWatermark]] contract
  * verbatim: [[ensure]] builds once per source fingerprint;
  * [[appendBatch]] invalidates the watermark FIRST (fail-closed)
  * then appends partials; [[serve]] takes the index path only while
  * the watermark holds and otherwise falls back to the raw scan —
  * both paths exact, so the q73 oracle (the raw aggregate in
  * DuckDB) gates the index path byte-for-byte. */
object EntityIndex {

  /** Partition fan-out of the store. 16 spans the test corpus's
    * entity range; a 10⁹-user deployment raises it with the corpus
    * (buckets ≈ entities / rows-per-partition-target) — the value is
    * layout, not semantics, so no result depends on it. */
  val Buckets = 16

  /** `_v2`: the v1 layout predates the recursive watermark listing —
    * its recorded manifest (empty: no top-level parquet in a
    * partitioned store) can never match the recursive live listing,
    * so a warm host's v1 artifact must be unreachable, not repaired
    * in place (the SchemaEvolution.FixtureVersion discipline). */
  def indexPath(dir: String): String =
    s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/entity_user_v2"

  private[graft] def bucketOf(userId: Long): Long =
    java.lang.Math.floorMod(userId, Buckets.toLong)

  /** Per-batch (bucket, user_id, day) → (n, v_fp) partials — shared
    * by build and append so the merge algebra is one projection.
    * v_fp keeps sum semantics (NULL for an all-NULL cell). */
  private def partials(batch: DataFrame): DataFrame =
    batch.select(col("user_id"),
        pmod(col("user_id"), lit(Buckets.toLong)).as("bucket"),
        MinMaxManifest.utcDay(col("ts")).as("day"),
        floor(col("value")).as("v"))
      .groupBy("bucket", "user_id", "day")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("v_fp"))

  /** Build once per source fingerprint: one shuffle of the corpus
    * down to (users × days) rows, written as one file per bucket
    * directory. Does NOT backfill a missing watermark (that state is
    * a crashed append's veto); [[reEnsure]] is the repair path. */
  def ensure(s: SparkSession, dir: String): Unit = {
    val path = indexPath(dir)
    if (IndexStore.artifactReady(path)) return
    partials(graft.Tables(s, dir, "events"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    EnsureWatermark.write(path)
  }

  /** Repair: rebuild from the raw table, restore the watermark;
    * out-of-band appended partials drop by design. */
  def reEnsure(s: SparkSession, dir: String): Unit = {
    val path = indexPath(dir)
    partials(graft.Tables(s, dir, "events"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    EnsureWatermark.write(path)
  }

  /** Incremental maintenance: O(batch) partials append into the
    * touched buckets; duplicate (user, day) keys fold at read time.
    * Serving from the INDEX is vetoed first (the batch is not in
    * events.parquet, so index ≠ raw until [[reEnsure]]). */
  def appendBatch(s: SparkSession, dir: String, batch: DataFrame): Unit = {
    require(IndexStore.artifactReady(indexPath(dir)),
      "entity index must be built before appending")
    EnsureWatermark.invalidate(indexPath(dir))
    partials(batch)
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("append").parquet(indexPath(dir))
  }

  /** WINDOWED profile serve — the day grain's payoff the class
    * scaladoc promises ("active days in January"): the same ≤|users|
    * bucket-partition reads, day-range filtered before the fold, so
    * a windowed profile costs exactly what a lifetime profile costs.
    * Same fail-closed raw-scan fallback as [[serve]]. */
  def serveWindow(s: SparkSession, dir: String, users: Seq[Long],
      lo: String, hi: String): (DataFrame, Boolean) = {
    require(users.nonEmpty, "empty lookup set")
    val loTs = lit(MinMaxManifest.utc(lo))
    val hiTs = lit(MinMaxManifest.utc(hi))
    val path = indexPath(dir)
    if (EnsureWatermark.holds(path)) {
      val buckets = users.map(bucketOf).distinct
      val df = s.read.parquet(path)
        .where(col("bucket").isin(buckets: _*) &&
          col("user_id").isin(users: _*) &&
          col("day") >= loTs && col("day") < hiTs)
        .groupBy(col("user_id"))
        .agg(sum(col("n")).as("n"), sum(col("v_fp")).as("v_fp"),
          countDistinct(col("day")).as("days"))
        .orderBy(col("user_id"))
      (df, true)
    } else {
      val df = graft.Tables(s, dir, "events")
        .where(col("user_id").isin(users: _*) &&
          MinMaxManifest.utcDay(col("ts")) >= loTs &&
          MinMaxManifest.utcDay(col("ts")) < hiTs)
        .select(col("user_id"), MinMaxManifest.utcDay(col("ts")).as("day"),
          floor(col("value")).as("v"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v_fp"),
          countDistinct(col("day")).as("days"))
        .orderBy(col("user_id"))
      (df, false)
    }
  }

  /** STREAMING maintenance — the [[HistogramRollup.processStreamBatch]]
    * batch-id discipline verbatim: each foreachBatch micro-batch's
    * partials land in their own `batch=b<id>` partition via
    * OVERWRITE, so a replayed batch (restart between sink write and
    * checkpoint commit) overwrites itself instead of double-counting
    * — exactly-once without an idempotent merge. */
  def streamPath(dir: String): String = indexPath(dir) + "_stream"

  def processStreamBatch(s: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): Unit = {
    ensure(s, dir)
    partials(batch).coalesce(1).write.mode("overwrite")
      .parquet(s"${streamPath(dir)}/batch=b$batchId")
  }

  /** Profile serve with committed stream batches folded in — reads
    * only `batch=` partitions that finished their write (the
    * [[IndexStore.readyBatches]] rule: a torn batch contributes
    * nothing until its replay overwrites it). The duplicate
    * (user, day) keys across base and batches fold by SUM /
    * re-distinct, the same read-time algebra as [[appendBatch]]. */
  def serveWithStream(s: SparkSession, dir: String,
      users: Seq[Long]): DataFrame = {
    require(users.nonEmpty, "empty lookup set")
    ensure(s, dir)
    val buckets = users.map(bucketOf).distinct
    val base = s.read.parquet(indexPath(dir))
      .where(col("bucket").isin(buckets: _*) &&
        col("user_id").isin(users: _*))
      .select("user_id", "day", "n", "v_fp")
    val ready = IndexStore.readyBatches(streamPath(dir))
    val all =
      if (ready.isEmpty) base
      else base.union(
        s.read.parquet(ready.map(t => s"${streamPath(dir)}/$t"): _*)
          .where(col("user_id").isin(users: _*))
          .select("user_id", "day", "n", "v_fp"))
    all.groupBy(col("user_id"))
      .agg(sum(col("n")).as("n"), sum(col("v_fp")).as("v_fp"),
        countDistinct(col("day")).as("days"))
      .orderBy(col("user_id"))
  }

  // ------------------------------------------------------------------
  // GDPR purge (D89) — the erasure story every other artifact family
  // already has (AnnDeletes for ANN, HistogramRollup CDC deletes,
  // DeletionVectors for the DV table), applied to the entity store:
  // merge-on-read TOMBSTONES at delete time (O(purge-set), no scan),
  // a purged serve face that anti-joins them on BOTH paths, and a
  // surgical vacuum that rewrites ONLY the buckets containing purged
  // users. Tombstones live beside the index (batch-tagged overwrite
  // — replays are bit-idempotent, distinct tags accumulate, the
  // AnnDeletes discipline verbatim); the UNPURGED serve face ignores
  // them, so gates over raw semantics (q73) and governed semantics
  // (q76) coexist on one artifact.
  // ------------------------------------------------------------------

  def purgePath(dir: String): String = indexPath(dir) + "_purged"

  /** Record an erasure batch: one tombstone row per user, scoped to
    * `tag` so a crash-replay overwrites itself. No data scan. */
  def purgeUsers(s: SparkSession, dir: String, users: Seq[Long],
      tag: String): Unit = {
    import s.implicits._
    ensure(s, dir)
    users.distinct.toDF("user_id").coalesce(1)
      .write.mode("overwrite").parquet(s"${purgePath(dir)}/batch=$tag")
  }

  /** All committed tombstones (torn batches invisible — the
    * readyBatches rule). Empty frame when none recorded. */
  def purgedKeys(s: SparkSession, dir: String): DataFrame = {
    val ready = IndexStore.readyBatches(purgePath(dir))
    if (ready.isEmpty) {
      import s.implicits._
      Seq.empty[Long].toDF("user_id")
    } else s.read.parquet(ready.map(t => s"${purgePath(dir)}/$t"): _*)
      .select(col("user_id")).distinct()
  }

  /** The GOVERNED profile serve: [[serve]] with the tombstone
    * anti-join applied on BOTH the index path and the raw-scan
    * fallback — a purged user never surfaces, whichever path runs.
    * The tombstone frame is purge-set-sized; Catalyst's size checks
    * broadcast it while it fits (never a forced hint). */
  def servePurged(s: SparkSession, dir: String,
      users: Seq[Long]): (DataFrame, Boolean) = {
    val (df, viaIndex) = serve(s, dir, users)
    (df.join(purgedKeys(s, dir), Seq("user_id"), "left_anti")
      .orderBy(col("user_id")), viaIndex)
  }

  /** The governed serve with stream batches folded in: the purge
    * anti-join applies AFTER the base ∪ stream union, so a purged
    * user never surfaces through a micro-batch either — erasure
    * outranks freshness on every path. */
  def servePurgedWithStream(s: SparkSession, dir: String,
      users: Seq[Long]): DataFrame =
    serveWithStream(s, dir, users)
      .join(purgedKeys(s, dir), Seq("user_id"), "left_anti")
      .orderBy(col("user_id"))

  /** Materialize the tombstones: rewrite ONLY the bucket partitions
    * that contain purged users (dynamic partition overwrite — the
    * other buckets' files are untouched, spec-pinned byte-identical),
    * then clear the tombstones LAST, so a crash at any point re-runs
    * to completion with [[servePurged]] exact throughout (before the
    * clear, the anti-join still filters; after, it is a no-op).
    * POST-VACUUM SEMANTICS: the store now IS the purged table — the
    * plain [[serve]] face reflects the erasure, exactly as a vacuumed
    * table format serves everyone the rewritten files. */
  def vacuumPurged(s: SparkSession, dir: String): Unit = {
    val purged = purgedKeys(s, dir)
    val hit = purged.select(
      pmod(col("user_id"), lit(Buckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    if (hit.isEmpty) return
    // STAGE the survivors of the touched buckets (a parquet overwrite
    // cannot read the path it replaces), then swap bucket-by-bucket:
    // staged partitions move in via dynamic overwrite, fully-purged
    // buckets (no staged partition) are dropped explicitly. Every
    // post-stage step is idempotent, and the tombstones clear LAST,
    // so a crash anywhere re-runs to completion with [[servePurged]]
    // exact throughout (before the clear the anti-join still filters;
    // after, it is a no-op).
    val staging = indexPath(dir) + ".vacuum"
    s.read.parquet(indexPath(dir))
      .where(col("bucket").isin(hit.toSeq: _*))
      .join(purged, Seq("user_id"), "left_anti")
      .select(col("user_id"), col("day"), col("n"), col("v_fp"), col("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(staging)
    val (fs, stagingP) = IndexStore.fsOf(staging)
    val alive = fs.listStatus(stagingP).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("bucket="))
      .map(_.stripPrefix("bucket=").toLong).toSet
    val prior = s.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      if (alive.nonEmpty)
        s.read.parquet(staging)
          .write.partitionBy("bucket").mode("overwrite").parquet(indexPath(dir))
    } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
    hit.filterNot(alive).foreach { b =>
      val (dfs, p) = IndexStore.fsOf(s"${indexPath(dir)}/bucket=$b")
      dfs.delete(p, true)
    }
    // the STREAM partials carry purged users too (r13 review's top
    // finding: clearing tombstones while a committed batch still
    // holds a purged user's rows would resurface them on every
    // stream-folded face). Rewrite each committed batch that holds a
    // purged row via its own staged swap.
    // stage/trash dirs are named OUTSIDE the `batch=` namespace so a
    // torn swap can never be read as a batch. The swap is rename-only
    // — old renamed ASIDE, stage renamed IN — so readers see the old
    // batch or the new one with only two atomic metadata ops between
    // (never a recursive delete's worth of darkness; the r13 advice's
    // visibility window), and servePurged* stays exact throughout
    // because the tombstones clear LAST. Recovery first — finish or
    // roll back any swap a crash left half-done:
    //   stage ready + target gone  -> rename the stage in
    //   trash present + target gone -> roll the old batch back
    //   anything with a live target -> superseded leftover, delete
    val (sfs, spp) = IndexStore.fsOf(streamPath(dir))
    if (sfs.exists(spp)) {
      sfs.listStatus(spp).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("vacuum_batch="))
        .foreach { stgName =>
          val tag = stgName.stripPrefix("vacuum_")
          val target = new org.apache.hadoop.fs.Path(spp, tag)
          val stg = new org.apache.hadoop.fs.Path(spp, stgName)
          if (!sfs.exists(target) &&
              IndexStore.artifactReady(stg.toString))
            require(sfs.rename(stg, target),
              s"vacuum recovery: rename $stg -> $target failed")
          else sfs.delete(stg, true) // torn or superseded stage
        }
      sfs.listStatus(spp).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("trash_batch="))
        .foreach { tName =>
          val tag = tName.stripPrefix("trash_")
          val target = new org.apache.hadoop.fs.Path(spp, tag)
          val t = new org.apache.hadoop.fs.Path(spp, tName)
          if (!sfs.exists(target)) // torn-stage rollback
            require(sfs.rename(t, target),
              s"vacuum recovery: rollback $t -> $target failed")
          else sfs.delete(t, true) // swap completed; drop the old copy
        }
    }
    IndexStore.readyBatches(streamPath(dir)).foreach { tag =>
      val bp = s"${streamPath(dir)}/$tag"
      val (bfs, bpp) = IndexStore.fsOf(bp)
      val stg = new org.apache.hadoop.fs.Path(spp, s"vacuum_$tag")
      val aside = new org.apache.hadoop.fs.Path(spp, s"trash_$tag")
      val batchDf = s.read.parquet(bp)
      if (!batchDf.join(purged, Seq("user_id"), "left_semi").isEmpty) {
        batchDf.join(purged, Seq("user_id"), "left_anti")
          .coalesce(1).write.mode("overwrite").parquet(stg.toString)
        // FAIL LOUD on either rename (r14 review): a silently failed
        // swap followed by the tombstone clear below would resurrect
        // the purged rows — aborting here leaves the tombstones in
        // place and the recovery legs above repair on the next run
        require(bfs.rename(bpp, aside),
          s"vacuum swap: rename $bpp -> $aside failed")
        require(bfs.rename(stg, bpp),
          s"vacuum swap: rename $stg -> $bpp failed")
        bfs.delete(aside, true)
        ()
      }
    }
    // the artifact mutated by design: re-stamp so serving continues
    // against the now-purged store (the watermark guards ACCIDENTAL
    // mutation; a vacuum is the owner's own commit)
    EnsureWatermark.write(indexPath(dir))
    fs.delete(stagingP, true)
    // clear LAST — idempotent replay point
    val (tfs, tp) = IndexStore.fsOf(purgePath(dir))
    tfs.delete(tp, true)
    ()
  }

  /** The per-user profile for `users`: (n, v_fp, active days).
    * Index path while the watermark holds — bucket partition pruning
    * + user filter, corpus never touched; raw-scan fallback
    * otherwise (exact either way, fail-closed like every routing
    * serve). Returns the frame and which path ran, for plan pinning. */
  def serve(s: SparkSession, dir: String,
      users: Seq[Long]): (DataFrame, Boolean) = {
    require(users.nonEmpty, "empty lookup set")
    val path = indexPath(dir)
    if (EnsureWatermark.holds(path)) {
      val buckets = users.map(bucketOf).distinct
      val df = s.read.parquet(path)
        .where(col("bucket").isin(buckets: _*) &&
          col("user_id").isin(users: _*))
        .groupBy(col("user_id"))
        .agg(sum(col("n")).as("n"), sum(col("v_fp")).as("v_fp"),
          countDistinct(col("day")).as("days"))
        .orderBy(col("user_id"))
      (df, true)
    } else {
      val df = graft.Tables(s, dir, "events")
        .where(col("user_id").isin(users: _*))
        .select(col("user_id"), MinMaxManifest.utcDay(col("ts")).as("day"),
          floor(col("value")).as("v"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("v_fp"),
          countDistinct(col("day")).as("days"))
        .orderBy(col("user_id"))
      (df, false)
    }
  }
}
