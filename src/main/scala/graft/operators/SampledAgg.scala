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

  /** O(batch) maintenance: the caller appended `batch` to the table
    * ALREADY; the batch's own sample appends to the artifact — the
    * deterministic membership makes the result bit-identical to a
    * full rebuild (spec-pinned). */
  def appendMaintainSample(s: SparkSession, dir: String, table: String,
      keyCol: String, ppm: Long, batch: DataFrame): Unit = {
    requireDivides(ppm)
    val p = samplePath(dir, table, keyCol, ppm)
    require(IndexStore.artifactReady(metaPath(p)),
      "sample must be built (ensureSample) before appendMaintainSample")
    batch.where(membership(keyCol, ppm))
      .write.mode("append").parquet(dataPath(p))
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
}
