package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** APPROXIMATE QUERY PROCESSING over a DETERMINISTIC materialized
  * sample (D98) — the BlinkDB / warehouse-sampling capability
  * (public designs) built on this engine's own disciplines: at
  * 100 TB a dashboard that tolerates ±1% does not need the corpus,
  * it needs a 0.1% sample with a stated error — 1000× less IO per
  * exploratory query, with the estimate's scaling integer-exact and
  * oracle-replayable.
  *
  * Why DETERMINISTIC sampling (the engine's no-rand() discipline,
  * [[graft.functions.DetHash]]): a row is in the sample iff
  * hash60(stable key ‖ salt) mod 10⁶ < ppm — a pure function of the
  * row, independent of partitioning, retries, and row order. Three
  * properties fall out:
  *
  *  - ORACLE-REPLAYABLE: DuckDB recomputes the same membership
  *    predicate and the same integer scaling (×10⁶/ppm, floor), so
  *    q88 hash-gates an approximate operator exactly;
  *  - O(batch) MAINTENANCE WITH ZERO DRIFT: an appended batch's
  *    sample is `batch.where(same predicate)` — no coordination, no
  *    reservoir state — and the maintained sample is BIT-IDENTICAL
  *    to a full rebuild (spec-pinned), because membership never
  *    depended on what else was in the corpus;
  *  - STRATIFICATION-SAFE ESTIMATES: every key has the same
  *    inclusion probability ppm/10⁶, so count/sum scale by the
  *    single factor 10⁶/ppm (Horvitz–Thompson with uniform weights).
  *
  * DELIBERATELY NOT TRANSPARENT: an optimizer that silently served
  * approximate answers would be wrong — approximation is a contract
  * the CALLER opts into, stated in the result itself (the serving
  * face returns sample and estimate columns side by side; the
  * statistical error model is the caller's to apply — the spec pins
  * a 6σ binomial bound holding on the gate fixture).
  *
  * Artifact lifecycle = the StatsMaintain contract: data written
  * first, the kilobyte meta (with the covered source fingerprint)
  * LAST as the commit point; [[sampleIfCurrent]] serves only while
  * covered == live listing, so an appended-but-unmaintained corpus
  * fails closed. `ppm` must divide 10⁶ (the scale factor stays an
  * integer — the replay's precondition). */
object SampledAgg {

  val M = 1000000L

  def samplePath(dir: String, table: String, keyCol: String,
      ppm: Long): String =
    s"${IndexStore.root}/aqp_${IndexStore.tablePathKey(dir, table)}_${table}_${keyCol}_$ppm"
  private def dataPath(p: String) = s"$p/data"
  private def metaPath(p: String) = s"$p/meta"

  /** The deterministic membership predicate — change ONLY in
    * lockstep with [[membershipSql]]. */
  def membership(keyCol: String, ppm: Long): org.apache.spark.sql.Column =
    pmod(graft.functions.DetHash.hash60(col(keyCol), "aqp"), lit(M)) < ppm

  /** DuckDB rendering of [[membership]] for oracle replays. */
  def membershipSql(keyExpr: String, ppm: Long): String =
    s"${graft.functions.DetHash.hash60Sql(keyExpr, "aqp")} % $M < $ppm"

  private def requireDivides(ppm: Long): Unit =
    require(ppm > 0 && M % ppm == 0,
      s"ppm must divide $M so the scale factor stays integer, got $ppm")

  /** Build the materialized sample once per (table fingerprint,
    * keyCol, ppm); idempotent while current. One filtered scan. */
  def ensureSample(s: SparkSession, dir: String, table: String,
      keyCol: String, ppm: Long): Unit = {
    requireDivides(ppm)
    if (sampleIfCurrent(s, dir, table, keyCol, ppm).isDefined) return
    val p = samplePath(dir, table, keyCol, ppm)
    val (fs, dp) = IndexStore.fsOf(dataPath(p))
    fs.delete(dp, true)
    graft.Tables(s, dir, table).where(membership(keyCol, ppm))
      .write.mode("overwrite").parquet(dataPath(p))
    writeMeta(s, dir, table, keyCol, ppm,
      graft.Tables(s, dir, table).count())
  }

  /** `rows` = the live table count the caller already holds (review
    * pass 2: recounting here doubled the metadata jobs per maintain). */
  private def writeMeta(s: SparkSession, dir: String, table: String,
      keyCol: String, ppm: Long, rows: Long): Unit = {
    import s.implicits._
    // the covered ROW COUNT rides the meta (r16 review #1): the
    // sample's own size relates to the table only statistically, so
    // the append-maintain coherence check needs the exact total
    Seq((IndexStore.fingerprint(dir, table), ppm, rows))
      .toDF("covered", "ppm", "rows").coalesce(1)
      .write.mode("overwrite").parquet(metaPath(samplePath(dir, table, keyCol, ppm)))
  }

  /** Stage-then-swap commit moves: the shared [[IndexStore.stageSwap]]
    * / [[IndexStore.recoverSwap]] pair (r15 — StatsMaintain's key
    * profiles adopted the same discipline, so the helpers moved to
    * the one store both ride). */
  private def stageSwap(fs: org.apache.hadoop.fs.FileSystem,
      stage: String, target: String): Unit =
    IndexStore.stageSwap(fs, stage, target)

  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
      stage: String, target: String): Unit =
    IndexStore.recoverSwap(fs, stage, target)

  /** O(batch + sample) maintenance, IDEMPOTENT under retries and
    * crash-repairing (r14 review): the caller appended `batch` to
    * the table ALREADY. An already-covered listing is a no-op; the
    * merge deduplicates on the row-unique `keyCol`, so a retry after
    * any crash window converges to exactly the rebuild's rows; the
    * merged data stages first and swaps with loud renames, meta
    * (the commit point) last. `keyCol` MUST be row-unique — the same
    * contract the stratified rank already requires. */
  def appendMaintainSample(s: SparkSession, dir: String, table: String,
      keyCol: String, ppm: Long, batch: DataFrame): Unit = {
    requireDivides(ppm)
    if (sampleIfCurrent(s, dir, table, keyCol, ppm).isDefined) return
    val p = samplePath(dir, table, keyCol, ppm)
    require(IndexStore.artifactReady(metaPath(p)),
      "sample must be built (ensureSample) before appendMaintainSample")
    // ROWCOUNT COHERENCE (r16 review #1): merging assumes live table
    // = covered listing + exactly this batch; an out-of-band delete
    // would leave deleted rows IN the sample stamped current —
    // breaking the bit-identical-to-rebuild contract. Pre-rows-stamp
    // metas (missing field) rebuild once; metadata-speed counts.
    val metaDf = s.read.parquet(metaPath(p))
    val coveredRows =
      if (metaDf.schema.fieldNames.contains("rows"))
        metaDf.head().getAs[Long]("rows")
      else -1L
    val liveRows = graft.Tables(s, dir, table).count()
    if (coveredRows < 0 || BigInt(coveredRows) + BigInt(batch.count()) !=
        BigInt(liveRows))
      return ensureSample(s, dir, table, keyCol, ppm)
    val (fs, _) = IndexStore.fsOf(p)
    recoverSwap(fs, s"$p/stage_data", dataPath(p))
    val merged = s.read.parquet(dataPath(p))
      .union(batch.where(membership(keyCol, ppm)))
      .dropDuplicates(keyCol)
    merged.write.mode("overwrite").parquet(s"$p/stage_data")
    stageSwap(fs, s"$p/stage_data", dataPath(p))
    writeMeta(s, dir, table, keyCol, ppm, liveRows)
  }

  /** The sampled rows while the artifact covers the LIVE listing —
    * an appended-but-unmaintained corpus fails closed. */
  def sampleIfCurrent(s: SparkSession, dir: String, table: String,
      keyCol: String, ppm: Long): Option[DataFrame] = {
    val p = samplePath(dir, table, keyCol, ppm)
    if (!IndexStore.artifactReady(metaPath(p)) ||
        !IndexStore.artifactReady(dataPath(p))) return None
    val meta = s.read.parquet(metaPath(p)).head()
    if (meta.getAs[String]("covered") != IndexStore.fingerprint(dir, table) ||
        meta.getAs[Long]("ppm") != ppm) None
    else Some(s.read.parquet(dataPath(p)))
  }

  /** The integer scale factor 10⁶/ppm — apply to sampled counts and
    * integer-valued sampled sums for the Horvitz–Thompson estimate. */
  def scaleFactor(ppm: Long): Long = { requireDivides(ppm); M / ppm }

  // ------------------------------------------------------------------
  // STRATIFIED sampling (D98's rare-group face — BlinkDB's actual
  // contribution, public design): a uniform ppm sample starves rare
  // strata (a 10⁻⁵ event type contributes ~0 rows at ppm = 10⁴, so
  // its estimate is garbage exactly where the analyst zooms in). The
  // stratified sample keeps the TOP-K ROWS BY HASH per stratum —
  // deterministic, so: the oracle replays membership as a SQL window
  // (row_number over (partition by stratum order by hash, key) ≤ K);
  // every stratum, however rare, carries min(K, n) rows; and the
  // per-stratum estimate scales by the exact recorded stratum count
  // (sum_sample × n_stratum ÷ k_used, integer division — replayable).
  // MAINTENANCE is O(batch + sample) and EXACT: a row ranked below K
  // can only sink as rows append (ranks are monotone under union),
  // so re-ranking (old sample ∪ batch) and keeping K is bit-identical
  // to a full rebuild — the top-K-rollup argument, applied to
  // sampling. Counts add exactly.
  // ------------------------------------------------------------------

  def stratSamplePath(dir: String, table: String, keyCol: String,
      stratumCol: String, k: Int): String =
    s"${IndexStore.root}/aqps_${IndexStore.tablePathKey(dir, table)}_${table}_${stratumCol}_$k"

  /** The deterministic per-stratum rank — change ONLY in lockstep
    * with the q89 oracle's window rendering. */
  private def rankCol(keyCol: String, stratumCol: String) =
    org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(graft.functions.DetHash.hash60(col(keyCol), "aqps"),
        col(keyCol))

  private def buildStrat(s: SparkSession, df: DataFrame, keyCol: String,
      stratumCol: String, k: Int): (DataFrame, DataFrame) = {
    val ranked = df.withColumn("__rk",
      row_number().over(rankCol(keyCol, stratumCol)))
    val sample = ranked.where(col("__rk") <= k).drop("__rk")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n"))
    (sample, counts)
  }

  /** Counts persist WITH the covered stamp they were computed for —
    * the crash-window discriminator: a retry that finds the counts
    * already stamped with the live listing must not add the batch
    * again (r14 review: the one leg dedup alone cannot repair). */
  private def writeStratCounts(s: SparkSession, counts: DataFrame,
      covered: String, path: String): Unit =
    counts.withColumn("covered", lit(covered))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Build the stratified sample once per fingerprint: one ranked
    * pass (the Z-order/recluster class of one-time cost) + one count
    * pass; idempotent while current. */
  def ensureStratifiedSample(s: SparkSession, dir: String, table: String,
      keyCol: String, stratumCol: String, k: Int): Unit = {
    require(k > 0, "k must be positive")
    if (stratifiedIfCurrent(s, dir, table, keyCol, stratumCol, k).isDefined) return
    val p = stratSamplePath(dir, table, keyCol, stratumCol, k)
    val (fs, dp) = IndexStore.fsOf(dataPath(p))
    fs.delete(dp, true)
    val (fs2, cp) = IndexStore.fsOf(s"$p/counts")
    fs2.delete(cp, true)
    val (sample, counts) = buildStrat(s,
      graft.Tables(s, dir, table), keyCol, stratumCol, k)
    sample.write.mode("overwrite").parquet(dataPath(p))
    writeStratCounts(s, counts,
      IndexStore.fingerprint(dir, table), s"$p/counts")
    writeStratMeta(s, dir, table, keyCol, stratumCol, k)
  }

  private def writeStratMeta(s: SparkSession, dir: String, table: String,
      keyCol: String, stratumCol: String, k: Int): Unit = {
    import s.implicits._
    Seq((IndexStore.fingerprint(dir, table), k))
      .toDF("covered", "k").coalesce(1).write.mode("overwrite")
      .parquet(metaPath(stratSamplePath(dir, table, keyCol, stratumCol, k)))
  }

  /** O(batch + sample) maintenance, EXACT and IDEMPOTENT (r14
    * review): the caller appended `batch` ALREADY. An already-
    * covered listing is a no-op. The data merge deduplicates on the
    * row-unique `keyCol` before re-ranking, so a retry after any
    * crash window converges to the rebuild's rows; the counts carry
    * their covered stamp, so a retry that finds them already at the
    * live listing (crash between counts swap and meta) never adds
    * the batch twice. Swaps fail loud; meta commits last. */
  def appendMaintainStratified(s: SparkSession, dir: String, table: String,
      keyCol: String, stratumCol: String, k: Int, batch: DataFrame): Unit = {
    if (stratifiedIfCurrent(s, dir, table, keyCol, stratumCol, k).isDefined)
      return
    val p = stratSamplePath(dir, table, keyCol, stratumCol, k)
    require(IndexStore.artifactReady(metaPath(p)),
      "stratified sample must be built (ensureStratifiedSample) first")
    val (fs, _) = IndexStore.fsOf(p)
    recoverSwap(fs, s"$p/stage/data", dataPath(p))
    recoverSwap(fs, s"$p/stage/counts", s"$p/counts")
    val live = IndexStore.fingerprint(dir, table)
    val (batchSample, batchCounts) = buildStrat(s, batch, keyCol, stratumCol, k)
    val merged = s.read.parquet(dataPath(p)).union(batchSample)
      .dropDuplicates(keyCol)
      .withColumn("__rk", row_number().over(rankCol(keyCol, stratumCol)))
      .where(col("__rk") <= k).drop("__rk")
    val oldCounts = s.read.parquet(s"$p/counts")
    val countsApplied = oldCounts.limit(1).select(col("covered"))
      .collect().headOption.exists(_.getString(0) == live)
    // ROWCOUNT COHERENCE (r16 review #1): the recorded counts' total
    // IS the covered row count; unless they already cover the live
    // listing (the crash window), Σn_old + |batch| must equal
    // |table| — an out-of-band delete would otherwise stamp exact
    // per-stratum counts over rows that no longer exist
    if (!countsApplied) {
      val oldTotal = Option(oldCounts.agg(sum(col("n"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      if (BigInt(oldTotal) + BigInt(batch.count()) !=
          BigInt(graft.Tables(s, dir, table).count()))
        // rebuild IN PLACE — never delete the artifact first (r16
        // review pass 2: deleting meta opens a crash window where
        // every retry hits the entry require and throws forever;
        // ensure's own overwrite sequence converges from stale state)
        return ensureStratifiedSample(s, dir, table, keyCol, stratumCol, k)
    }
    val mergedCounts =
      if (countsApplied) oldCounts.select(col("stratum"), col("n"))
      else oldCounts.select(col("stratum"), col("n")).union(batchCounts)
        .groupBy(col("stratum")).agg(sum(col("n")).as("n"))
    // stage-then-swap: the merges read the paths they replace
    merged.write.mode("overwrite").parquet(s"$p/stage/data")
    writeStratCounts(s, mergedCounts, live, s"$p/stage/counts")
    stageSwap(fs, s"$p/stage/data", dataPath(p))
    stageSwap(fs, s"$p/stage/counts", s"$p/counts")
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/stage"), true)
    writeStratMeta(s, dir, table, keyCol, stratumCol, k)
  }

  // ------------------------------------------------------------------
  // EXACT GROUP ROLLUP (r16, the ladder's error-0 rung): a persisted
  // (group, n, Σ⌊v⌋) table — |groups| rows, kilobytes — maintained
  // ADDITIVELY at O(batch) (counts and integer sums add exactly, the
  // stratified-counts covered-stamp discipline for crash
  // idempotency). When current it DOMINATES every sampled rung on
  // both axes (error 0 ≤ any tolerance; |groups| rows ≤ any sample),
  // so the tolerance ladders consult it FIRST — the D50 rollup
  // lesson restated inside AQP: a dashboard that declared ±5% gets
  // the exact answer for free when someone ensured the rollup.
  // ------------------------------------------------------------------

  def groupRollupPath(dir: String, table: String, groupCol: String,
      valueCol: String): String =
    s"${IndexStore.root}/aqpr_${IndexStore.tablePathKey(dir, table)}_${table}_${groupCol}_$valueCol"

  private def rollupAgg(df: DataFrame, groupCol: String, valueCol: String) =
    df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col(valueCol)).cast("long")).as("s"))

  /** Rows + the covered stamp they were computed for land TOGETHER
    * (the [[writeStratCounts]] discipline): a retry discriminates
    * "merged already" by the rows' own stamp. */
  private def writeGroupRollup(s: SparkSession, rows: DataFrame,
      covered: String, path: String): Unit =
    rows.withColumn("covered", lit(covered))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/data")

  /** Build once per fingerprint from one grouped pass; idempotent
    * while current. */
  def ensureGroupRollup(s: SparkSession, dir: String, table: String,
      groupCol: String, valueCol: String): Unit = {
    if (groupRollupIfCurrent(s, dir, table, groupCol, valueCol).isDefined)
      return
    val p = groupRollupPath(dir, table, groupCol, valueCol)
    writeGroupRollup(s, rollupAgg(graft.Tables(s, dir, table),
      groupCol, valueCol), IndexStore.fingerprint(dir, table), p)
  }

  /** O(batch) ADDITIVE maintenance, idempotent: the caller appended
    * `batch` ALREADY; counts and integer sums add exactly, so the
    * merged artifact equals a rebuild. A retry that finds the rows
    * already stamped with the live listing is a no-op (the stamp
    * rides the rows — one atomic parquet overwrite, no torn window
    * between data and stamp). */
  def appendMaintainGroupRollup(s: SparkSession, dir: String, table: String,
      groupCol: String, valueCol: String, batch: DataFrame): Unit = {
    if (groupRollupIfCurrent(s, dir, table, groupCol, valueCol).isDefined)
      return
    val p = groupRollupPath(dir, table, groupCol, valueCol)
    if (!IndexStore.artifactReady(s"$p/data"))
      // unbuilt or torn mid-overwrite: the repair is a full rebuild —
      // loud-absent converges, never a crash-looping require (the r15
      // keyprof lesson)
      return ensureGroupRollup(s, dir, table, groupCol, valueCol)
    val oldSlim = s.read.parquet(s"$p/data").select(col("grp"), col("n"), col("s"))
    val old = oldSlim.collect().toSeq // |groups| rows — kilobytes by contract
    // ROWCOUNT COHERENCE (r16 review #1): merging assumes live table
    // = covered listing + exactly this batch. The rollup's own Σn IS
    // the covered row count, so an out-of-band delete/replacement
    // between the covered stamp and this append shows up as
    // Σn_old + |batch| ≠ |table| — and a blind merge would stamp
    // WRONG EXACT data (served at rel_err 0) as current. Mismatch →
    // full rebuild; the counts are parquet-metadata-speed.
    val oldRows = old.map(_.getAs[Long]("n")).foldLeft(BigInt(0))(_ + _)
    if (oldRows + BigInt(batch.count()) !=
        BigInt(graft.Tables(s, dir, table).count()))
      return ensureGroupRollup(s, dir, table, groupCol, valueCol)
    val oldDf = s.createDataFrame(
      s.sparkContext.parallelize(old, 1), oldSlim.schema)
    val merged = rollupAgg(batch, groupCol, valueCol)
      .select(col("grp"), col("n"), col("s"))
      .union(oldDf)
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
    writeGroupRollup(s, merged, IndexStore.fingerprint(dir, table), p)
  }

  /** Drop the rollup artifact — the q100 gate's determinism reset
    * (idempotent; the next ensure rebuilds in one grouped pass). */
  def dropGroupRollup(dir: String, table: String, groupCol: String,
      valueCol: String): Unit = {
    val (fs, p) = IndexStore.fsOf(
      groupRollupPath(dir, table, groupCol, valueCol))
    fs.delete(p, true)
    ()
  }

  /** Drop EVERY group rollup of (dir, table) — the lineage-break
    * tombstone must not depend on which (group, value) pairs the
    * CURRENT ingest configuration names (r16 review #3: a rollup
    * maintained under an earlier configuration would survive the
    * break with pre-replacement counts and poison a later re-add).
    * Glob over the shared table-path key; idempotent. */
  def dropAllGroupRollups(dir: String, table: String): Unit =
    dropAllByPrefix(s"aqpr_${IndexStore.tablePathKey(dir, table)}_${table}_")

  /** [[dropAllGroupRollups]] for the group HISTOGRAMS (D109) — the
    * same lineage-tombstone sweep: a partition replacement can
    * preserve the row count, so the coherence screen alone cannot
    * catch it; the break must drop every artifact of the table. */
  def dropAllGroupHistograms(dir: String, table: String): Unit =
    dropAllByPrefix(s"aqph_${IndexStore.tablePathKey(dir, table)}_${table}_")

  private def dropAllByPrefix(namePrefix: String): Unit = {
    val (fs, root) = IndexStore.fsOf(IndexStore.root)
    if (!fs.exists(root)) return
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith(namePrefix))
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** (grp, n, s) while the artifact covers the LIVE listing. */
  def groupRollupIfCurrent(s: SparkSession, dir: String, table: String,
      groupCol: String, valueCol: String): Option[DataFrame] = {
    val p = groupRollupPath(dir, table, groupCol, valueCol)
    if (!IndexStore.artifactReady(s"$p/data")) return None
    val df = s.read.parquet(s"$p/data")
    val covered = df.limit(1).select(col("covered")).collect()
      .headOption.map(_.getString(0))
    if (!covered.contains(IndexStore.fingerprint(dir, table))) None
    else Some(df.select(col("grp"), col("n"), col("s")))
  }

  // ------------------------------------------------------------------
  // TOLERANCE-DECLARED SERVING (r14 verdict #7 — "make the opt-in
  // consumable"): the caller states WHAT error it tolerates, the
  // engine picks HOW to serve — approximation stays a contract the
  // caller sees (the tolerance is the opt-in; the answer carries its
  // source and its per-group disclosed bound), never a silent
  // substitution. The decision ladder, cheapest honest answer first:
  //  1. the smallest CURRENT uniform sample whose worst SEEN group
  //     meets the tolerance — bound = 2·10⁶ / ⌊√k⌋ ppm, the 2σ
  //     binomial relative error of the Horvitz–Thompson count
  //     estimate (Var(k) ≈ n·p for small p ⇒ rel-σ ≈ 1/√k);
  //     integer-exact, so DuckDB replays the bound itself;
  //  2. a CURRENT stratified artifact whose stratum IS the group
  //     column: its per-stratum counts are recorded EXACTLY, so the
  //     answer is error-0 without touching the corpus;
  //  3. the corpus (exact, error 0) — the fail-closed floor when no
  //     current artifact covers the live listing.
  // Disclosed limitation: a group the uniform sample never SAW is
  // invisible to both the estimate and the min-k screen — the screen
  // protects seen-group accuracy (a sample whose thinnest seen group
  // misses the tolerance escalates); rare-group completeness is what
  // the stratified tier is for.
  // ------------------------------------------------------------------

  /** The per-group 2σ relative error bound, in ppm — integer-exact
    * for positive k (floor-of-positive-quotient ≡ both engines'
    * integer division; double sqrt agrees on ⌊√k⌋ at these
    * magnitudes). */
  private def relErrPpm(k: org.apache.spark.sql.Column) =
    floor(lit(2L * M) / floor(sqrt(k.cast("double")))).cast("long")

  /** Serve per-group counts of `table` grouped by `groupCol` within
    * the caller's declared `tolerancePpm` (2σ relative, ppm).
    * Returns (frame, source): columns (groupCol, n_est,
    * rel_err_ppm, source), source ∈ sample_<ppm> | stratified |
    * exact. Deterministic: a pure function of the persisted
    * artifacts and the tolerance. */
  def serveGroupCounts(s: SparkSession, dir: String, table: String,
      keyCol: String, groupCol: String, tolerancePpm: Long,
      ppms: Seq[Long] = Seq.empty,
      stratifiedK: Option[Int] = None,
      rollupValueCol: Option[String] = None): (DataFrame, String) = {
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    require(!ReservedServeNames.contains(groupCol),
      s"groupCol collides with a reserved serving column: $groupCol")
    // 0. the exact group rollup (r16): error 0 at |groups| rows
    //    dominates every sampled rung on both axes — consult it first
    rollupValueCol.foreach { vc =>
      groupRollupIfCurrent(s, dir, table, groupCol, vc).foreach { r =>
        return (r.select(col("grp").as(groupCol), col("n").as("n_est"),
          lit(0L).as("rel_err_ppm"), lit("rollup").as("source")), "rollup")
      }
    }
    // 1. cheapest uniform sample meeting the tolerance on its worst
    //    SEEN group
    ppms.sorted.foreach { ppm =>
      sampleIfCurrent(s, dir, table, keyCol, ppm).foreach { sample =>
        val ks = sample.groupBy(col(groupCol)).agg(count(lit(1)).as("__k"))
        // null-safe: an EMPTY-but-current sample (nothing hashed under
        // ppm) must fall down the ladder, not NPE (r15 self-review)
        val minK = Option(ks.agg(min(col("__k"))).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        val worst = 2L * M / math.floor(math.sqrt(minK.toDouble)).toLong.max(1L)
        if (minK >= 1 && worst <= tolerancePpm) {
          val source = s"sample_$ppm"
          return (ks.select(col(groupCol),
            (col("__k") * scaleFactor(ppm)).as("n_est"),
            relErrPpm(col("__k")).as("rel_err_ppm"),
            lit(source).as("source")), source)
        }
      }
    }
    // 2. stratified-by-group artifact: exact recorded counts, no scan
    stratifiedK.foreach { k =>
      stratifiedIfCurrent(s, dir, table, keyCol, groupCol, k).foreach {
        case (_, counts) =>
          return (counts.select(col("stratum").as(groupCol),
            col("n").as("n_est"),
            lit(0L).as("rel_err_ppm"),
            lit("stratified").as("source")), "stratified")
      }
    }
    // 3. fail-closed floor: the corpus, exactly
    (graft.Tables(s, dir, table).groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_est"))
      .select(col(groupCol), col("n_est"),
        lit(0L).as("rel_err_ppm"), lit("exact").as("source")), "exact")
  }

  /** SUM face of the tolerance ladder (D102): same contract as
    * [[serveGroupCounts]], for per-group sums of the FLOORED value
    * column (the engine's fixed-point discipline — replayable
    * integer sums). The bound is the 2σ relative error of the
    * Horvitz–Thompson sum from the sample's own variance:
    * rel-σ(Σ̂) = √(k·Σv² − (Σv)²) / (Σv·√k) — every ingredient an
    * exact 64-bit integer aggregate of the sample, the final
    * sqrt/division in IEEE doubles computed identically by both
    * engines from identical integers, floored to ppm (DuckDB replays
    * the BOUND, not just the estimate). Documented envelope,
    * ENFORCED: k·Σv² must stay below 2⁶³ (holds through the 100×
    * replica; a corpus with |v| beyond ~10⁶ should band the value
    * first), and the STRATIFIED rung additionally requires
    * k·mv·n < 2⁶³ — its estimate is the scale-up (Σv·n) div k and
    * n is the unbounded exact stratum count (r16 advice). Outside
    * either, the rung refuses and the ladder falls down.
    * Non-positive group sums serve the conservative cap 10⁶ ppm.
    * The STRATIFIED leg scales by its exact recorded count (the q89
    * integer formula) with the same variance bound per stratum —
    * and a stratum fully contained in the sample (k = n) is EXACT,
    * bound 0. */
  private def sumBound(k: org.apache.spark.sql.Column,
      s1: org.apache.spark.sql.Column,
      s2: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(s1 > 0L,
      floor(lit(2000000.0) *
        sqrt(greatest(k * s2 - s1 * s1, lit(0L)).cast("double")) /
        (s1.cast("double") * sqrt(k.cast("double")))).cast("long"))
      .otherwise(lit(1000000L))

  /** The variance-bound ingredient frame shared by the SUM and AVG
    * faces (r16 review #8 — one copy, never two drifting ones):
    * per-group count, Σ⌊v⌋, Σ⌊v⌋², max|⌊v⌋|. */
  private def sumIngredients(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = floor(col(valueCol)).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__k"), sum(v).as("__s1"),
        sum(v * v).as("__s2"), max(abs(v)).as("__mv"))
  }

  /** None on an empty frame (null max) — the ladder falls through
    * instead of NPEing (r15 self-review). */
  private def worstBoundOf(ing: DataFrame,
      bound: org.apache.spark.sql.Column): Option[Long] =
    Option(ing.agg(max(bound)).head().get(0)).map(_.asInstanceOf[Long])

  /** The ENFORCED overflow envelope shared by both faces (r15 review
    * #2 + r16 advice): k²·mv² bounds every product in the bound
    * formula; `withScaleN` additionally bounds the STRATIFIED sum
    * rung's scale-up product (|Σv|·n ≤ k·mv·n) — the AVG faces
    * divide, never multiply, so they pass withScaleN = false. */
  private def boundEnvelope(ing: DataFrame,
      withScaleN: Boolean = false): Boolean = {
    val aggs = Seq(max(col("__k")), max(col("__mv"))) ++
      (if (withScaleN) Seq(max(col("__n"))) else Nil)
    val r = ing.agg(aggs.head, aggs.tail: _*).head()
    (Option(r.get(0)), Option(r.get(1))) match {
      case (Some(k0), Some(mv0)) =>
        val k = BigInt(k0.asInstanceOf[Long])
        val mv = BigInt(mv0.asInstanceOf[Long])
        val boundOk = k * k * mv * mv < BigInt(Long.MaxValue)
        val scaleOk = !withScaleN || Option(r.get(2)).exists { n0 =>
          k * mv * BigInt(n0.asInstanceOf[Long]) < BigInt(Long.MaxValue)
        }
        boundOk && scaleOk
      case _ => false // empty frame: nothing to serve from this rung
    }
  }

  /** Reserved internal/output names — a group column shadowing one
    * would make the serve frames ambiguous (r15 review: the engine's
    * own fixtures use a column literally named "k"). */
  private val ReservedServeNames =
    Set("__k", "__s1", "__s2", "__mv", "__n", "n_est", "sum_est",
      "avg_est", "rel_err_ppm", "source")

  def serveGroupSums(s: SparkSession, dir: String, table: String,
      keyCol: String, groupCol: String, valueCol: String,
      tolerancePpm: Long, ppms: Seq[Long] = Seq.empty,
      stratifiedK: Option[Int] = None): (DataFrame, String) = {
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    require(!ReservedServeNames.contains(groupCol),
      s"groupCol collides with a reserved serving column: $groupCol")
    // 0. the exact group rollup (r16): error 0 at |groups| rows —
    //    the cheapest honest answer when someone ensured it
    groupRollupIfCurrent(s, dir, table, groupCol, valueCol).foreach { r =>
      return (r.select(col("grp").as(groupCol), col("s").as("sum_est"),
        lit(0L).as("rel_err_ppm"), lit("rollup").as("source")), "rollup")
    }
    // 1. cheapest uniform sample whose worst group bound meets it
    //    (shared [[sumIngredients]]/[[boundEnvelope]] — r16 review #8)
    ppms.sorted.foreach { ppm =>
      sampleIfCurrent(s, dir, table, keyCol, ppm).foreach { sample =>
        val ing = sumIngredients(sample, groupCol, valueCol)
        val b = sumBound(col("__k"), col("__s1"), col("__s2"))
        if (boundEnvelope(ing) &&
            worstBoundOf(ing, b).exists(_ <= tolerancePpm)) {
          val source = s"sample_$ppm"
          return (ing.select(col(groupCol),
            (col("__s1") * scaleFactor(ppm)).as("sum_est"),
            b.as("rel_err_ppm"), lit(source).as("source")), source)
        }
      }
    }
    // 2. stratified-by-group: exact-count scaling, variance bound per
    //    stratum; a fully-contained stratum (k = n) is exact. The
    //    scale-up product needs the withScaleN envelope (r16 advice)
    stratifiedK.foreach { kk =>
      stratifiedIfCurrent(s, dir, table, keyCol, groupCol, kk).foreach {
        case (sample, counts) =>
          val ing = sumIngredients(sample, groupCol, valueCol)
            .join(counts.select(col("stratum").as(groupCol),
              col("n").as("__n")), Seq(groupCol))
          val b = when(col("__k") === col("__n"), lit(0L))
            .otherwise(sumBound(col("__k"), col("__s1"), col("__s2")))
          if (boundEnvelope(ing, withScaleN = true) &&
              worstBoundOf(ing, b).exists(_ <= tolerancePpm))
            return (ing.select(col(groupCol),
              expr("(__s1 * __n) div __k").as("sum_est"),
              b.as("rel_err_ppm"), lit("stratified").as("source")),
              "stratified")
      }
    }
    // 3. the corpus, exactly
    (graft.Tables(s, dir, table).groupBy(col(groupCol))
      .agg(sum(floor(col(valueCol)).cast("long")).as("sum_est"))
      .select(col(groupCol), col("sum_est"),
        lit(0L).as("rel_err_ppm"), lit("exact").as("source")), "exact")
  }

  /** AVG face of the tolerance ladder (r16, the r15 verdict's #3):
    * per-group FLOOR-AVERAGES of the floored value column —
    * `avg_est = Σ⌊v⌋ div k`, integer division in both engines, so
    * DuckDB replays estimate AND bound. The ratio-estimator bound is
    * [[sumBound]] itself: at fixed group size the relative error of
    * the mean equals the relative error of the Horvitz–Thompson sum
    * (both scale Σv by a constant), so the 2σ formula carries over
    * unchanged. Rungs, cheapest honest first: the exact group rollup
    * (s div n, error 0), the cheapest uniform sample within
    * tolerance, the stratified artifact (a per-stratum top-K-by-hash
    * draw IS a uniform draw within the stratum; k = n strata exact),
    * the exact corpus floor. No scale-up envelope needed — the
    * estimate divides, never multiplies (the k²mv² check still
    * guards the bound's own products). */
  def serveGroupAvgs(s: SparkSession, dir: String, table: String,
      keyCol: String, groupCol: String, valueCol: String,
      tolerancePpm: Long, ppms: Seq[Long] = Seq.empty,
      stratifiedK: Option[Int] = None): (DataFrame, String) = {
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    require(!ReservedServeNames.contains(groupCol),
      s"groupCol collides with a reserved serving column: $groupCol")
    // 0. exact rollup: avg = s div n, error 0
    groupRollupIfCurrent(s, dir, table, groupCol, valueCol).foreach { r =>
      return (r.select(col("grp").as(groupCol),
        expr("s div n").as("avg_est"),
        lit(0L).as("rel_err_ppm"), lit("rollup").as("source")), "rollup")
    }
    // 1. cheapest uniform sample whose worst group bound meets it
    //    (shared [[sumIngredients]]/[[boundEnvelope]] — r16 review #8;
    //    the AVG estimate divides, so withScaleN stays false)
    ppms.sorted.foreach { ppm =>
      sampleIfCurrent(s, dir, table, keyCol, ppm).foreach { sample =>
        val ing = sumIngredients(sample, groupCol, valueCol)
        val b = sumBound(col("__k"), col("__s1"), col("__s2"))
        if (boundEnvelope(ing) &&
            worstBoundOf(ing, b).exists(_ <= tolerancePpm)) {
          val source = s"sample_$ppm"
          return (ing.select(col(groupCol),
            expr("__s1 div __k").as("avg_est"),
            b.as("rel_err_ppm"), lit(source).as("source")), source)
        }
      }
    }
    // 2. stratified-by-group: the stratum mean from its sample rows;
    //    a fully-contained stratum (k = n) is exact, bound 0
    stratifiedK.foreach { kk =>
      stratifiedIfCurrent(s, dir, table, keyCol, groupCol, kk).foreach {
        case (sample, counts) =>
          val ing = sumIngredients(sample, groupCol, valueCol)
            .join(counts.select(col("stratum").as(groupCol),
              col("n").as("__n")), Seq(groupCol))
          val b = when(col("__k") === col("__n"), lit(0L))
            .otherwise(sumBound(col("__k"), col("__s1"), col("__s2")))
          if (boundEnvelope(ing) &&
              worstBoundOf(ing, b).exists(_ <= tolerancePpm))
            return (ing.select(col(groupCol),
              expr("__s1 div __k").as("avg_est"),
              b.as("rel_err_ppm"), lit("stratified").as("source")),
              "stratified")
      }
    }
    // 3. the corpus, exactly: floor-avg = Σ⌊v⌋ div count
    (graft.Tables(s, dir, table).groupBy(col(groupCol))
      .agg(sum(floor(col(valueCol)).cast("long")).as("__s1"),
        count(lit(1)).as("__k"))
      .select(col(groupCol), expr("__s1 div __k").as("avg_est"),
        lit(0L).as("rel_err_ppm"), lit("exact").as("source")), "exact")
  }

  // ------------------------------------------------------------------
  // QUANTILE face (r16, the r15 verdict's #3): the D39 histogram is
  // an EXACT-algebra artifact the ladder never consulted — its bin
  // counts are exact, so a percentile estimate interpolated inside
  // the rank-k bin is within ONE BIN WIDTH of the exact order
  // statistic (the cumulative counts place rank k in that bin with
  // certainty). That absolute bound discloses as a per-group relative
  // ppm bound; when it meets the declared tolerance the quantile is
  // served from ≤101 kilobyte-sized bin rows per group — the scan-
  // free rung. The floor is the exact rank-k order statistic (a
  // per-group sort — the cost the histogram rung exists to avoid).
  // Both rungs emit 1e4-scaled BIGINTs (the q36 integer discipline:
  // no float tie to break, DuckDB replays estimate AND bound).
  // ------------------------------------------------------------------

  /** Serve the p-th percentile of events.value per event_type over a
    * DAY-ALIGNED window within the caller's tolerance. Returns
    * (frame, source): columns (event_type, q_e4, rel_err_ppm,
    * source), source ∈ histogram | exact. The histogram rung serves
    * only while [[HistogramRollup.routable]] holds (artifact current
    * vs the live events listing — the fail-closed contract). */
  def serveQuantile(s: SparkSession, dir: String, lo: String, hi: String,
      p: Int, tolerancePpm: Long): (DataFrame, String) = {
    require(p >= 1 && p <= 99, s"percentile in [1, 99], got $p")
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    // ENFORCED day alignment (r16 review #4): the histogram's grain
    // is the day — a mid-day bound would make the two rungs evaluate
    // DIFFERENT windows (bins are day-keyed, the exact floor filters
    // raw ts) and the disclosed bound would not cover the excluded
    // partial day's mass. The check PARSES (the same rendering utc()
    // accepts — review pass 2: a string-suffix test rejected valid
    // ISO-T day-aligned bounds and tested rendering, not alignment)
    require(Seq(lo, hi).forall(t =>
        MinMaxManifest.utc(t).toInstant.getEpochSecond % 86400L == 0L),
      s"serveQuantile windows must be day-aligned (histogram grain): [$lo, $hi)")
    val HR = HistogramRollup
    // 1. the histogram rung: disclosed bound = one bin width,
    //    relative to the estimate — integer-exact, replayable
    if (HR.routable(HR.histPath(dir))) {
      val est = HR.percentiles(HR.mergedBins(s, dir, lo, hi), Seq(p))
        .select(col("event_type"), col(s"p${p}_e4").as("q_e4"))
      val overflowE4 = HR.NumBins.toLong * HR.BinWidthE4
      // integer DIV, never float-divide-then-cast (the r7 tie lesson)
      val b = when(col("q_e4") <= 0L || col("q_e4") >= lit(overflowE4),
        lit(M)) // bin 0 or the unbounded overflow bin: no honest rel bound
        .otherwise(expr(s"${HR.BinWidthE4 * M}L DIV q_e4"))
      val worst = Option(est.agg(max(b)).head().get(0))
        .map(_.asInstanceOf[Long])
      if (worst.exists(_ <= tolerancePpm))
        return (est.select(col("event_type"), col("q_e4"),
          b.as("rel_err_ppm"), lit("histogram").as("source")), "histogram")
    }
    // 2. the exact floor: rank k = ⌈p·n/100⌉ (the histogram's own k),
    //    value at rank k, e4-floored — a per-group sort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("__v_e4"))
    val grp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val exact = graft.Tables(s, dir, "events")
      .where(col("ts") >= lit(MinMaxManifest.utc(lo)) &&
        col("ts") < lit(MinMaxManifest.utc(hi)))
      .select(col("event_type"),
        floor(col("value") * 10000.0).cast("long").as("__v_e4"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(grp))
      .where(col("__rk") === expr(s"(${p}L * __n + 99L) DIV 100L"))
      .select(col("event_type"), col("__v_e4").as("q_e4"),
        lit(0L).as("rel_err_ppm"), lit("exact").as("source"))
    (exact, "exact")
  }

  // ------------------------------------------------------------------
  // GENERIC GROUP HISTOGRAM (D109, r16) — the D39 fixed-bin algebra
  // freed from the events table: a persisted (grp, bin, cnt) table
  // for ANY (table, groupCol, valueCol), additively O(batch)-
  // maintainable, serving per-group percentiles at |groups|·bins
  // rows with the one-bin-width disclosed bound. NULL values land in
  // the SENTINEL bin −1, so Σcnt equals the table row count and the
  // rowcount coherence check rides the artifact's own mass (no extra
  // stamp field). Contract: groupCol is a dashboard dimension
  // (bounded cardinality — the artifact is |groups|·(numBins+2)
  // rows); the merge stages and swaps, never a driver collect.
  // ------------------------------------------------------------------

  def groupHistPath(dir: String, table: String, groupCol: String,
      valueCol: String): String =
    s"${IndexStore.root}/aqph_${IndexStore.tablePathKey(dir, table)}_${table}_${groupCol}_$valueCol"

  private def histBinCol(valueCol: String, binWidth: Double, numBins: Int) =
    when(col(valueCol).isNull, lit(-1L))
      .otherwise(greatest(lit(0L),
        least(floor(col(valueCol) / binWidth).cast("long"),
          lit(numBins.toLong))))

  private def histBins(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double, numBins: Int): DataFrame =
    df.select(col(groupCol).as("grp"),
        histBinCol(valueCol, binWidth, numBins).as("bin"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  private def writeGroupHistMeta(s: SparkSession, p: String,
      covered: String, binWidthE4: Long, numBins: Int): Unit = {
    import s.implicits._
    Seq((covered, binWidthE4, numBins))
      .toDF("covered", "bin_width_e4", "num_bins")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
  }

  /** Build once per fingerprint from one binning pass. `binWidth`
    * must render exactly at e4 scale (the integer-replay contract).
    * The covered stamp AND the knobs ride the DATA rows (review pass
    * 3: the crash-window meta re-commit must recover the knobs the
    * data was actually binned with, never the surviving meta's); the
    * meta (knobs + stamp) is the serve point. A current artifact
    * with DIFFERENT knobs than requested is re-provisioned, never a
    * silent no-op (the stratifiedIfCurrent k-check precedent). */
  def ensureGroupHistogram(s: SparkSession, dir: String, table: String,
      groupCol: String, valueCol: String, binWidth: Double = 5.0,
      numBins: Int = 100): Unit = {
    val binWidthE4 = math.round(binWidth * 10000.0)
    require(binWidthE4 > 0 && binWidthE4 / 10000.0 == binWidth,
      s"binWidth must be exact at e4 scale, got $binWidth")
    if (groupHistIfCurrent(s, dir, table, groupCol, valueCol)
        .exists { case (_, bw, nb) => bw == binWidthE4 && nb == numBins })
      return
    val p = groupHistPath(dir, table, groupCol, valueCol)
    val covered = IndexStore.fingerprint(dir, table)
    histBins(graft.Tables(s, dir, table), groupCol, valueCol,
        binWidth, numBins)
      .withColumn("covered", lit(covered))
      .withColumn("bin_width_e4", lit(binWidthE4))
      .withColumn("num_bins", lit(numBins))
      .write.mode("overwrite").parquet(s"$p/data")
    writeGroupHistMeta(s, p, covered, binWidthE4, numBins)
  }

  /** O(batch) ADDITIVE maintenance, idempotent and crash-convergent:
    * bin counts add exactly, so the merged artifact equals a rebuild;
    * the data's own covered stamp discriminates the rows-committed/
    * meta-missing crash window (re-commit the meta, merge nothing);
    * the rowcount coherence screen (Σcnt IS the covered row count —
    * the null sentinel makes that exact) rebuilds on out-of-band
    * mutation; a torn artifact reads absent and rebuilds. */
  def appendMaintainGroupHistogram(s: SparkSession, dir: String,
      table: String, groupCol: String, valueCol: String,
      batch: DataFrame): Unit = {
    if (groupHistIfCurrent(s, dir, table, groupCol, valueCol).isDefined)
      return
    val p = groupHistPath(dir, table, groupCol, valueCol)
    if (!IndexStore.artifactReady(s"$p/data")) {
      // torn or unbuilt data: rebuild with the META's knobs when it
      // survived (review pass 3: a torn custom-knob artifact must not
      // silently degrade to the defaults), else the defaults
      if (IndexStore.artifactReady(s"$p/meta")) {
        val m = s.read.parquet(s"$p/meta").head()
        return ensureGroupHistogram(s, dir, table, groupCol, valueCol,
          m.getAs[Long]("bin_width_e4") / 10000.0, m.getAs[Int]("num_bins"))
      }
      return ensureGroupHistogram(s, dir, table, groupCol, valueCol)
    }
    if (!IndexStore.artifactReady(s"$p/meta"))
      return ensureGroupHistogram(s, dir, table, groupCol, valueCol)
    val (fs, _) = IndexStore.fsOf(p)
    IndexStore.recoverSwap(fs, s"$p/stage_data", s"$p/data")
    val live = IndexStore.fingerprint(dir, table)
    val old = s.read.parquet(s"$p/data")
    if (!old.schema.fieldNames.contains("bin_width_e4")) {
      // pre-knob-stamp layout: rebuild once under the meta's knobs
      val m = s.read.parquet(s"$p/meta").head()
      return ensureGroupHistogram(s, dir, table, groupCol, valueCol,
        m.getAs[Long]("bin_width_e4") / 10000.0, m.getAs[Int]("num_bins"))
    }
    val head = old.limit(1)
      .select(col("covered"), col("bin_width_e4"), col("num_bins"))
      .collect().headOption
    val dataCovered = head.map(_.getString(0))
    // the knobs the data was ACTUALLY binned with ride the rows —
    // the only truth the crash-window re-commit may stamp (review
    // pass 3: the surviving meta could carry a superseded
    // provisioning's knobs)
    val (binWidthE4, numBins) = head
      .map(r => (r.getLong(1), r.getInt(2)))
      .getOrElse((50000L, 100))
    if (dataCovered.contains(live)) {
      // crash window: data committed for this listing, meta did not
      // land — re-commit the meta (with the data's own knobs), merge
      // nothing
      writeGroupHistMeta(s, p, live, binWidthE4, numBins)
      return
    }
    val oldTotal = Option(old.agg(sum(col("cnt"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (BigInt(oldTotal) + BigInt(batch.count()) !=
        BigInt(graft.Tables(s, dir, table).count()))
      return ensureGroupHistogram(s, dir, table, groupCol, valueCol,
        binWidthE4 / 10000.0, numBins)
    val merged = old.select(col("grp"), col("bin"), col("cnt"))
      .union(histBins(batch, groupCol, valueCol,
        binWidthE4 / 10000.0, numBins))
      .groupBy(col("grp"), col("bin")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("covered", lit(live))
      .withColumn("bin_width_e4", lit(binWidthE4))
      .withColumn("num_bins", lit(numBins))
    merged.write.mode("overwrite").parquet(s"$p/stage_data")
    IndexStore.stageSwap(fs, s"$p/stage_data", s"$p/data")
    writeGroupHistMeta(s, p, live, binWidthE4, numBins)
  }

  /** (bins frame (grp, bin, cnt), binWidthE4, numBins) while the
    * artifact covers the LIVE listing. */
  def groupHistIfCurrent(s: SparkSession, dir: String, table: String,
      groupCol: String, valueCol: String)
      : Option[(DataFrame, Long, Int)] = {
    val p = groupHistPath(dir, table, groupCol, valueCol)
    if (!IndexStore.artifactReady(s"$p/data") ||
        !IndexStore.artifactReady(s"$p/meta")) return None
    val meta = s.read.parquet(s"$p/meta").head()
    if (meta.getAs[String]("covered") != IndexStore.fingerprint(dir, table))
      None
    else Some((s.read.parquet(s"$p/data")
        .select(col("grp"), col("bin"), col("cnt")),
      meta.getAs[Long]("bin_width_e4"), meta.getAs[Int]("num_bins")))
  }

  /** Tolerance-declared PER-GROUP percentiles for any (table,
    * groupCol, valueCol) — the [[serveQuantile]] ladder freed from
    * the events histogram: rung 1 serves from the group histogram's
    * exact bin counts (rank k lands inside one bin with certainty →
    * the disclosed bound is one bin width, integer DIV, replayable;
    * bin 0 / the unbounded overflow bin cap at 10⁶); rung 2 is the
    * exact rank-k order statistic per group (the per-group sort the
    * histogram rung exists to avoid). NULL values are outside the
    * percentile in BOTH rungs (the sentinel bin never enters the
    * walk; the exact rung filters non-null). 1e4-scaled BIGINTs
    * throughout — the q36 discipline. Output: (grp, q_e4,
    * rel_err_ppm, source). */
  def serveGroupQuantiles(s: SparkSession, dir: String, table: String,
      groupCol: String, valueCol: String, p: Int,
      tolerancePpm: Long): (DataFrame, String) = {
    require(p >= 1 && p <= 99, s"percentile in [1, 99], got $p")
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    groupHistIfCurrent(s, dir, table, groupCol, valueCol).foreach {
      case (bins, binWidthE4, numBins) =>
        val grpW = org.apache.spark.sql.expressions.Window.partitionBy("grp")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy("bin")
        val withCum = bins.where(col("bin") >= 0L)
          .withColumn("n", sum("cnt").over(grpW))
          .withColumn("cum", sum("cnt").over(w))
        val kSql = s"(${p}L * n + 99L) DIV 100L"
        val e4 = expr(
          s"""CASE WHEN bin = ${numBins}L THEN ${numBins * binWidthE4}L
             |ELSE ${binWidthE4}L * bin
             |  + ($binWidthE4 * ($kSql - (cum - cnt))) DIV cnt END""".stripMargin)
        val est = withCum.groupBy(col("grp"))
          .agg(min(when(col("cum") >= expr(kSql),
            struct(col("bin"), e4.as("e")))).getField("e").as("q_e4"))
        val overflowE4 = numBins.toLong * binWidthE4
        val b = when(col("q_e4") <= 0L || col("q_e4") >= lit(overflowE4),
          lit(M))
          .otherwise(expr(s"${binWidthE4 * M}L DIV q_e4"))
        val worst = Option(est.agg(max(b)).head().get(0))
          .map(_.asInstanceOf[Long])
        if (worst.exists(_ <= tolerancePpm))
          return (est.select(col("grp"), col("q_e4"),
            b.as("rel_err_ppm"), lit("histogram").as("source")), "histogram")
    }
    // the exact floor: rank k = ⌈p·n/100⌉ per group, e4-floored
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("__v_e4"))
    val grpW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
    (graft.Tables(s, dir, table)
      .where(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        floor(col(valueCol) * 10000.0).cast("long").as("__v_e4"))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(grpW))
      .where(col("__rk") === expr(s"(${p}L * __n + 99L) DIV 100L"))
      .select(col("grp"), col("__v_e4").as("q_e4"),
        lit(0L).as("rel_err_ppm"), lit("exact").as("source")), "exact")
  }

  /** The q93/q95 GATE FIXTURE: a four-equal-group table derived from
    * events (g = event_id mod 4 — DuckDB replays it inline; the raw
    * value column rides along for the SUM face), with the 25%
    * uniform sample and the stratified-by-g artifact built.
    * Idempotent per events fingerprint; _v2 in the path = the
    * fixture-version discipline (v1 lacked the value column — a warm
    * host must not serve the old shape). */
  def ensureToleranceFixture(s: SparkSession, dir: String): String = {
    val fix = s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/aqp_tol_fixture_v2"
    if (!IndexStore.artifactReady(s"$fix/tol_t.parquet"))
      graft.Tables(s, dir, "events")
        .select(col("event_id"), pmod(col("event_id"), lit(4L)).as("g"),
          col("value"))
        .write.mode("overwrite").parquet(s"$fix/tol_t.parquet")
    ensureSample(s, fix, "tol_t", "event_id", 250000L)
    ensureStratifiedSample(s, fix, "tol_t", "event_id", "g", 500)
    fix
  }

  /** q100's AVG-face fixture: the tolerance fixture's derivation
    * under its OWN table name (`tol_a`), so the group rollup the q100
    * gate builds and drops can never collide with q93/q95's
    * sampled-rung pins on `tol_t` — artifact isolation per gate, the
    * fixture discipline. */
  def ensureToleranceAvgFixture(s: SparkSession, dir: String): String = {
    val fix = s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/aqp_tol_fixture_v2"
    if (!IndexStore.artifactReady(s"$fix/tol_a.parquet"))
      graft.Tables(s, dir, "events")
        .select(col("event_id"), pmod(col("event_id"), lit(4L)).as("g"),
          col("value"))
        .write.mode("overwrite").parquet(s"$fix/tol_a.parquet")
    ensureSample(s, fix, "tol_a", "event_id", 250000L)
    fix
  }

  /** (sample rows, exact per-stratum counts) while current. */
  def stratifiedIfCurrent(s: SparkSession, dir: String, table: String,
      keyCol: String, stratumCol: String,
      k: Int): Option[(DataFrame, DataFrame)] = {
    val p = stratSamplePath(dir, table, keyCol, stratumCol, k)
    if (!IndexStore.artifactReady(metaPath(p)) ||
        !IndexStore.artifactReady(dataPath(p)) ||
        !IndexStore.artifactReady(s"$p/counts")) return None
    val meta = s.read.parquet(metaPath(p)).head()
    if (meta.getAs[String]("covered") != IndexStore.fingerprint(dir, table) ||
        meta.getAs[Int]("k") != k) None
    else Some((s.read.parquet(dataPath(p)),
      s.read.parquet(s"$p/counts").select(col("stratum"), col("n"))))
  }
}
