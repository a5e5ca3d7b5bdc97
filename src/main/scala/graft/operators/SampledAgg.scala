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
      ppm: Long): String = {
    val (fs, p) = IndexStore.fsOf(s"$dir/$table.parquet")
    val canon = fs.makeQualified(p).toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${IndexStore.root}/aqp_${key}_${table}_${keyCol}_$ppm"
  }
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
    writeMeta(s, dir, table, keyCol, ppm)
  }

  private def writeMeta(s: SparkSession, dir: String, table: String,
      keyCol: String, ppm: Long): Unit = {
    import s.implicits._
    Seq((IndexStore.fingerprint(dir, table), ppm))
      .toDF("covered", "ppm").coalesce(1)
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
    val (fs, _) = IndexStore.fsOf(p)
    recoverSwap(fs, s"$p/stage_data", dataPath(p))
    val merged = s.read.parquet(dataPath(p))
      .union(batch.where(membership(keyCol, ppm)))
      .dropDuplicates(keyCol)
    merged.write.mode("overwrite").parquet(s"$p/stage_data")
    stageSwap(fs, s"$p/stage_data", dataPath(p))
    writeMeta(s, dir, table, keyCol, ppm)
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
      stratumCol: String, k: Int): String = {
    val (fs, p) = IndexStore.fsOf(s"$dir/$table.parquet")
    val canon = fs.makeQualified(p).toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${IndexStore.root}/aqps_${key}_${table}_${stratumCol}_$k"
  }

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
      stratifiedK: Option[Int] = None): (DataFrame, String) = {
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    require(!ReservedServeNames.contains(groupCol),
      s"groupCol collides with a reserved serving column: $groupCol")
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

  /** Reserved internal/output names — a group column shadowing one
    * would make the serve frames ambiguous (r15 review: the engine's
    * own fixtures use a column literally named "k"). */
  private val ReservedServeNames =
    Set("__k", "__s1", "__s2", "__mv", "__n", "n_est", "sum_est",
      "rel_err_ppm", "source")

  def serveGroupSums(s: SparkSession, dir: String, table: String,
      keyCol: String, groupCol: String, valueCol: String,
      tolerancePpm: Long, ppms: Seq[Long] = Seq.empty,
      stratifiedK: Option[Int] = None): (DataFrame, String) = {
    require(tolerancePpm >= 0, "tolerance is a ppm bound, >= 0")
    require(!ReservedServeNames.contains(groupCol),
      s"groupCol collides with a reserved serving column: $groupCol")
    def v = floor(col(valueCol)).cast("long")
    def ingredients(df: DataFrame) = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__k"), sum(v).as("__s1"), sum(v * v).as("__s2"),
        max(abs(v)).as("__mv"))
    // None on an empty frame (null max) — the ladder falls through
    // instead of NPEing (r15 self-review)
    def worstOf(ing: DataFrame,
        bound: org.apache.spark.sql.Column): Option[Long] =
      Option(ing.agg(max(bound)).head().get(0)).map(_.asInstanceOf[Long])
    // the documented envelope, ENFORCED (r15 review #2): the variance
    // ingredients are 64-bit; k²·max(v)² bounds every product in the
    // bound formula (k·Σv² ≤ k²mv², s1² ≤ k²mv²), so a group outside
    // it could have silently wrapped — the rung refuses and the
    // ladder falls down, never serving a fabricated bound.
    // `withScaleN = true` (the STRATIFIED rung, r16 advice): that
    // rung's estimate is the SCALE-UP (Σv·n) div k, and n — the exact
    // full stratum row count — is unbounded by the k²mv² check; since
    // |Σv| ≤ k·mv, requiring k·mv·maxN < 2⁶³ bounds the long product
    // Σv·n too, so a ~10¹⁰-row stratum can no longer wrap into a
    // garbage sum_est served with a small disclosed bound
    def inEnvelope(ing: DataFrame, withScaleN: Boolean = false): Boolean = {
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
    // 1. cheapest uniform sample whose worst group bound meets it
    ppms.sorted.foreach { ppm =>
      sampleIfCurrent(s, dir, table, keyCol, ppm).foreach { sample =>
        val ing = ingredients(sample)
        val b = sumBound(col("__k"), col("__s1"), col("__s2"))
        if (inEnvelope(ing) && worstOf(ing, b).exists(_ <= tolerancePpm)) {
          val source = s"sample_$ppm"
          return (ing.select(col(groupCol),
            (col("__s1") * scaleFactor(ppm)).as("sum_est"),
            b.as("rel_err_ppm"), lit(source).as("source")), source)
        }
      }
    }
    // 2. stratified-by-group: exact-count scaling, variance bound per
    //    stratum; a fully-contained stratum (k = n) is exact
    stratifiedK.foreach { kk =>
      stratifiedIfCurrent(s, dir, table, keyCol, groupCol, kk).foreach {
        case (sample, counts) =>
          val ing = ingredients(sample)
            .join(counts.select(col("stratum").as(groupCol),
              col("n").as("__n")), Seq(groupCol))
          val b = when(col("__k") === col("__n"), lit(0L))
            .otherwise(sumBound(col("__k"), col("__s1"), col("__s2")))
          if (inEnvelope(ing, withScaleN = true) &&
              worstOf(ing, b).exists(_ <= tolerancePpm))
            return (ing.select(col(groupCol),
              expr("(__s1 * __n) div __k").as("sum_est"),
              b.as("rel_err_ppm"), lit("stratified").as("source")),
              "stratified")
      }
    }
    // 3. the corpus, exactly
    (graft.Tables(s, dir, table).groupBy(col(groupCol))
      .agg(sum(v).as("sum_est"))
      .select(col(groupCol), col("sum_est"),
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
