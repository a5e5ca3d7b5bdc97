package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXPONENTIALLY-DECAYED FEATURE ROLLUP — the feature-store staple
  * ("engagement in the last N days, recent days weighted higher")
  * built on the same mergeable-rollup algebra as [[HistogramRollup]]:
  * persist per-(day, entity-cohort, event_type) PARTIAL SUMS once,
  * and answer any (as-of date, half-life) question by folding decay
  * weights over the daily rows — kilobytes of rollup IO instead of an
  * event scan, with the reference date and horizon free at QUERY time
  * because the stored partials are undecayed (the decay is applied at
  * read, not at write — storing decayed values would pin one as-of
  * date into the artifact).
  *
  * INTEGER-EXACT END-TO-END (the q36 discipline): the daily partial
  * is Σ floor(value) per cell — a BIGINT; a read with horizon H
  * weights day d (age a = asOf − d, 0 ≤ a ≤ H) by 2^(H−a), so the
  * score is Σ daily_fp · 2^(H−a) — pure integer products and sums,
  * order-free, identical in Spark and DuckDB (2^k for k ≤ 50 is exact
  * in the double `pow` both engines evaluate before the BIGINT cast).
  * The reported score is therefore the 2^H-scaled decayed sum with
  * half-life = one day. Overflow headroom: with H = 20 the per-day
  * term is ≤ rows/day·10³·2²⁰ ≈ 2·10¹³ at sf0.1 — five decimal
  * decades of BIGINT headroom; a deployment near the edge widens the
  * fold to DECIMAL(38,0), not the artifact.
  *
  * Algebra: partials merge by SUM (a late day's rows just add — the
  * [[HistogramRollup.appendBatch]] contract), and deletes retract as
  * negative partials (the D42 invertibility), so one daily table
  * serves every horizon, every as-of date, and incremental
  * maintenance without rescans. */
object DecayedFeatures {

  /** Entity cohorts: features are per-entity in a real store; the
    * registered surface folds users into 16 cohorts so the released
    * frame is group-sized at every SF. */
  val Cohorts = 16L

  def dailyPath(dir: String): String =
    s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/feat_daily"

  /** The per-batch (day, event_type, cohort) → (n, v_fp) projection
    * shared by the build, the append leg, and CDC retractions. */
  private def partials(batch: DataFrame): DataFrame =
    batch.select(
        MinMaxManifest.utcDay(col("ts")).as("day"),
        col("event_type"),
        (col("user_id") % Cohorts).as("cohort"),
        floor(col("value")).cast("long").as("v"))
      .groupBy("day", "event_type", "cohort")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("v_fp"))

  /** Build the daily partial-sum table once per corpus lifetime. */
  def ensure(s: SparkSession, dir: String): Unit = {
    val path = dailyPath(dir)
    if (IndexStore.artifactReady(path)) return
    partials(graft.Tables(s, dir, "events"))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Late-data / incremental maintenance: a batch's partials append;
    * the read-side SUM folds duplicate (day, type, cohort) keys. Same
    * exactly-once contract as [[HistogramRollup.appendBatch]]. */
  def appendBatch(s: SparkSession, dir: String, batch: DataFrame): Unit = {
    require(IndexStore.artifactReady(dailyPath(dir)),
      "daily feature table must be built before appending")
    partials(batch)
      .coalesce(1).write.mode("append").parquet(dailyPath(dir))
  }

  /** The decayed feature read: per (event_type, cohort), the
    * 2^H-scaled exponentially-decayed value sum and the undecayed
    * recent event count, as of `asOf` (UTC day) over a horizon of
    * `h` days (ages 0..h inclusive; older days weigh zero and are
    * pruned before the fold). Touches ONLY the daily rollup —
    * plan-pinned scan-free. */
  def features(s: SparkSession, dir: String, asOf: String, h: Int): DataFrame = {
    ensure(s, dir)
    // zone-FREE age in days: epoch arithmetic on the UTC-midnight day
    // keys (the utcDay discipline — a to_date()/datediff() fold would
    // follow the session zone and mis-age every day under non-UTC)
    val asOfSec = MinMaxManifest.utc(asOf).toInstant.getEpochSecond
    val age = ((lit(asOfSec) - unix_timestamp(col("day"))) / lit(86400L))
      .cast("long")
    s.read.parquet(dailyPath(dir))
      .where(age >= 0 && age <= h)
      .groupBy(col("event_type"), col("cohort"))
      .agg(
        sum(col("n")).as("n_recent"),
        sum(col("v_fp") *
          pow(lit(2.0), (lit(h) - age).cast("double")).cast("long"))
          .as("score_e"))
  }
}
