package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** INCREMENTAL STATISTICS MAINTENANCE (D91) — the freshness story
  * the ANALYZE catalog (D77) deliberately lacks: [[StatsCatalog]]
  * keys its artifact on the source LISTING fingerprint, so any
  * append re-keys the path and everything downstream fails closed
  * until a full re-ANALYZE — the right call for PROOFS (uniqueness,
  * FDs), but at 100 TB with hourly appends the ADVISORY consumers
  * (estimates, join advice, dictionary screens) cannot afford a
  * corpus scan per batch. This object maintains an approx-grade
  * stats artifact in O(batch) per append (auto-stats maintenance in
  * SQL Server / Oracle incremental statistics — public designs):
  *
  *  - n / nulls ADD exactly; min / max MIN/MAX exactly (merged under
  *    the column's own type, never its string rendering — "9" > "10"
  *    lexicographically);
  *  - NDV rides the engine's own deterministic HLL ([[SketchRollup]]'s
  *    register algebra, per column): register MAX-merge is EXACT —
  *    merged registers are bit-identical to a full rebuild's
  *    (spec-pinned), so maintenance never degrades the sketch, only
  *    the estimate keeps HLL's usual error.
  *
  * CURRENCY contract: the summary records the source-listing
  * fingerprint it COVERS; [[statsIfCurrent]] serves only while that
  * matches the live listing. The caller appends the data file FIRST,
  * then maintains — a crash between the two leaves covered ≠ live →
  * fail-closed stale, repaired by [[reEnsure]] or a late
  * [[appendMaintain]] of the same batch. The summary (which carries
  * the stamp) is written LAST, after the registers — a torn write
  * fails `artifactReady` or the stamp check, never serves halves.
  *
  * Costs, stated: the one-time [[ensure]] pays one scan per column
  * for registers (the ExactNdvBatch class of trade — bounded
  * per-task sketch mass); every [[appendMaintain]] scans ONLY the
  * batch. Artifact size is columns × (1 summary row + ≤512 register
  * rows) — kilobytes, collected driver-side for the merge (bounded
  * by schema width, never by corpus). EXACT-mode consumers are
  * untouched: [[StatsCatalog.uniqueNonNull]]/[[StatsCatalog
  * .determines]] still demand a real ANALYZE of the exact listing. */
object StatsMaintain {

  def maintPath(dir: String, table: String): String = {
    // key on the FS-QUALIFIED table path, not the raw string: the
    // estimator derives `dir` from a relation's rootPaths (scheme-
    // qualified, "file:/…"), callers pass bare "/…" — both must land
    // on ONE artifact
    val (fs, p) = IndexStore.fsOf(s"$dir/$table.parquet")
    val canon = fs.makeQualified(p).toString
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${IndexStore.root}/stats_maint_${key}_$table"
  }
  private def sumPath(dir: String, table: String) = s"${maintPath(dir, table)}/summary"
  private def regPath(dir: String, table: String) = s"${maintPath(dir, table)}/registers"

  /** One maintained column: exact n/nulls/min/max + the HLL NDV
    * estimate (rounded long; advisory-grade by construction). */
  final case class MaintainedCol(column: String, n: Long, nulls: Long,
      min: Option[String], max: Option[String], ndvEst: Long)

  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Typed min/max merge: parse both renderings under the column's
    * dtype and keep the winner — never a lexicographic compare of
    * numbers. */
  private def mergeBound(dt: DataType, a: Option[String], b: Option[String],
      takeMin: Boolean): Option[String] = (a, b) match {
    case (None, x) => x
    case (x, None) => x
    case (Some(x), Some(y)) =>
      val cmp: Int = dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          x.toLong.compareTo(y.toLong)
        case FloatType | DoubleType => x.toDouble.compareTo(y.toDouble)
        case dec: DecimalType =>
          BigDecimal(x).compare(BigDecimal(y))
        case _ => x.compareTo(y) // strings, rendered timestamps (ISO sorts)
      }
      if ((cmp <= 0) == takeMin) Some(x) else Some(y)
  }

  /** One-pass per-batch summary: total count + per-column count/min/max. */
  private def summarize(df: DataFrame): Seq[(String, Long, Long, Option[String], Option[String])] = {
    val cols = df.schema.fields
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("_n") +: cols.toSeq.flatMap { f =>
        val c = col(f.name)
        val bounds =
          if (orderable(f.dataType))
            Seq(min(c).cast(StringType), max(c).cast(StringType))
          else Seq(lit(null).cast(StringType), lit(null).cast(StringType))
        count(c) +: bounds
      }
    val r: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    cols.zipWithIndex.map { case (f, i) =>
      val base = 1 + i * 3
      (f.name, n, n - r.getLong(base),
        Option(r.getString(base + 1)), Option(r.getString(base + 2)))
    }.toIndexedSeq
  }

  /** Per-column HLL register rows (column, reg, rho) — one scan per
    * column, the SketchRollup algebra with a per-column salt. */
  private def registerRows(df: DataFrame): DataFrame = {
    import SketchRollup.{MaxRho, P}
    def rho(payload: org.apache.spark.sql.Column) =
      when(payload === 0L, lit(MaxRho))
        .otherwise(lit(MaxRho) - length(bin(payload)))
    df.schema.fields.map { f =>
      val h = graft.functions.DetHash.hash60(col(f.name), s"maint_${f.name}")
      df.where(col(f.name).isNotNull)
        .select(lit(f.name).as("column"),
          h.bitwiseAND(lit((SketchRollup.M - 1).toLong)).as("reg"),
          rho(shiftright(h, P)).as("rho"))
        .groupBy(col("column"), col("reg"))
        .agg(max(col("rho")).as("rho"))
    }.reduce(_.union(_))
  }

  private def writeArtifact(s: SparkSession, dir: String, table: String,
      sums: Seq[(String, Long, Long, Option[String], Option[String])],
      regs: DataFrame): Unit = {
    import s.implicits._
    // registers first; the summary carries the covered stamp and is
    // the COMMIT point (see class scaladoc)
    regs.coalesce(1).write.mode("overwrite").parquet(regPath(dir, table))
    val covered = IndexStore.fingerprint(dir, table)
    sums.map { case (c, n, nulls, mn, mx) => (c, n, nulls, mn, mx, covered) }
      .toDF("column", "n", "nulls", "min", "max", "covered")
      .coalesce(1).write.mode("overwrite").parquet(sumPath(dir, table))
  }

  /** Build once from a full scan; safe to call when already current. */
  def ensure(s: SparkSession, dir: String, table: String): Unit =
    if (statsIfCurrent(s, dir, table).isEmpty) reEnsure(s, dir, table)

  /** Full rebuild — the repair path for a stale or torn artifact. */
  def reEnsure(s: SparkSession, dir: String, table: String): Unit = {
    val df = graft.Tables(s, dir, table)
    writeArtifact(s, dir, table, summarize(df), registerRows(df))
  }

  /** O(batch) maintenance: the caller appended `batch`'s rows to the
    * table ALREADY (covered stamp is taken from the post-append
    * listing); this merges the batch's partials into the artifact —
    * the batch is the only data scanned. */
  def appendMaintain(s: SparkSession, dir: String, table: String,
      batch: DataFrame): Unit = {
    import s.implicits._
    val old = readArtifact(s, dir, table).getOrElse(sys.error(
      "maintained stats must be built (ensure) before appendMaintain"))
    val dtypes = graft.Tables(s, dir, table).schema
      .fields.map(f => f.name -> f.dataType).toMap
    val batchSums = summarize(batch).map(t => t._1 -> t).toMap
    // every appended row advances EVERY maintained column's row count
    // — a column the batch frame lacks is served as NULL by the
    // parquet scan for each batch row, so n and nulls advance
    // together and the bounds stand (r13 advice: the old behavior
    // froze n for the missing column while its siblings advanced,
    // leaving statsIfCurrent internally inconsistent)
    val batchN = batchSums.values.headOption.map(_._2).getOrElse(0L)
    val mergedSums = old.map { m =>
      val dt = dtypes(m.column)
      batchSums.get(m.column) match {
        case None => (m.column, m.n + batchN, m.nulls + batchN, m.min, m.max)
        case Some((_, bn, bnulls, bmin, bmax)) =>
          (m.column, m.n + bn, m.nulls + bnulls,
            mergeBound(dt, m.min, bmin, takeMin = true),
            mergeBound(dt, m.max, bmax, takeMin = false))
      }
    }
    // register max-merge: batch registers (a Spark job over the
    // batch) ∪ the old rows (kilobytes, re-parallelized) — the write
    // never reads the path it replaces
    val oldRegs = s.read.parquet(regPath(dir, table))
      .as[(String, Long, Long)].collect().toSeq
    val merged = registerRows(batch)
      .union(oldRegs.toDF("column", "reg", "rho"))
      .groupBy(col("column"), col("reg")).agg(max(col("rho")).as("rho"))
    writeArtifact(s, dir, table, mergedSums, merged)
  }

  private def readArtifact(s: SparkSession, dir: String,
      table: String): Option[Seq[MaintainedCol]] = {
    if (!IndexStore.artifactReady(sumPath(dir, table)) ||
        !IndexStore.artifactReady(regPath(dir, table))) return None
    val ests = estimates(s, dir, table)
    Some(s.read.parquet(sumPath(dir, table)).collect().toSeq.map { r =>
      MaintainedCol(r.getAs[String]("column"), r.getAs[Long]("n"),
        r.getAs[Long]("nulls"), Option(r.getAs[String]("min")),
        Option(r.getAs[String]("max")),
        ests.getOrElse(r.getAs[String]("column"), 0L))
    })
  }

  /** HLL estimate per column from the persisted registers (the
    * [[SketchRollup.estimate]] formula keyed by column). */
  private def estimates(s: SparkSession, dir: String,
      table: String): Map[String, Long] = {
    val m = SketchRollup.M
    val twoPow52 = 4503599627370496L
    s.read.parquet(regPath(dir, table))
      .groupBy(col("column"))
      .agg(count(lit(1)).as("regs_hit"),
        sum(pow(lit(2.0), lit(SketchRollup.MaxRho) - col("rho")).cast("long"))
          .as("z_obs"))
      .withColumn("zeros", lit(m.toLong) - col("regs_hit"))
      .withColumn("z_int", col("z_obs") + col("zeros") * twoPow52)
      .withColumn("raw",
        lit(0.7213 / (1.0 + 1.079 / m)) * m * m * twoPow52.toDouble /
          col("z_int").cast("double"))
      .withColumn("est",
        round(when(col("raw") <= 2.5 * m && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros").cast("double")))
          .otherwise(col("raw"))).cast("long"))
      .select(col("column"), col("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** The q80 GATE FIXTURE: a managed copy of events split into a
    * base build + a late-appended slice (users ≡ 2 mod 5), with the
    * stats MAINTAINED across the append — base ∪ slice ≡ events by
    * construction, so the DuckDB oracle recomputes the exact fields
    * from the raw table and the hash gates the maintenance algebra.
    * Idempotent per events fingerprint: a warm host with current
    * maintained stats skips all mutation. */
  def ensureMaintainedEventsFixture(s: SparkSession, dir: String): String = {
    val fix = s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/maint_fixture"
    val T = "events_m"
    if (statsIfCurrent(s, fix, T).isEmpty) {
      val (tfs, tp) = IndexStore.fsOf(s"$fix/$T.parquet")
      tfs.delete(tp, true)
      val (afs, ap) = IndexStore.fsOf(maintPath(fix, T))
      afs.delete(ap, true)
      val ev = graft.Tables(s, dir, "events")
      val isSlice = pmod(col("user_id"), lit(5L)) === 2L
      ev.where(!isSlice).write.mode("overwrite").parquet(s"$fix/$T.parquet")
      ensure(s, fix, T)
      ev.where(isSlice).write.mode("append").parquet(s"$fix/$T.parquet")
      appendMaintain(s, fix, T, ev.where(isSlice))
    }
    fix
  }

  /** The serving face: Some only while the artifact is intact AND
    * covers exactly the table's LIVE listing — an appended-but-not-
    * maintained file fails closed. */
  def statsIfCurrent(s: SparkSession, dir: String,
      table: String): Option[Map[String, MaintainedCol]] = {
    if (!IndexStore.artifactReady(sumPath(dir, table))) return None
    val rows = s.read.parquet(sumPath(dir, table)).limit(1)
      .select(col("covered")).collect()
    val covered = rows.headOption.map(_.getString(0)).getOrElse(return None)
    if (covered != IndexStore.fingerprint(dir, table)) None
    else readArtifact(s, dir, table).map(_.map(m => m.column -> m).toMap)
  }
}
