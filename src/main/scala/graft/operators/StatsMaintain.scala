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

  def maintPath(dir: String, table: String): String =
    // keyed on the FS-QUALIFIED table path, not the raw string: the
    // estimator derives `dir` from a relation's rootPaths (scheme-
    // qualified, "file:/…"), callers pass bare "/…" — both must land
    // on ONE artifact ([[IndexStore.tablePathKey]], shared with the
    // AQP artifact families)
    s"${IndexStore.root}/stats_maint_${IndexStore.tablePathKey(dir, table)}_$table"
  private def sumPath(dir: String, table: String) = s"${maintPath(dir, table)}/summary"
  private def regPath(dir: String, table: String) = s"${maintPath(dir, table)}/registers"

  /** One maintained column: exact n/nulls/min/max + the HLL NDV
    * estimate (rounded long; advisory-grade by construction).
    * `degraded` (r16, the CDC-delete story): after a
    * [[deleteMaintain]], n/nulls stay EXACT but min/max are only
    * one-sided BOUNDS of the live range (deletes can only shrink it)
    * and ndvEst is an UPPER bound (register max-merge has no
    * inverse) — still advisory-safe, flagged so [[Steering
    * .adviseAnalyze]] can name the re-ANALYZE that restores
    * exactness. */
  final case class MaintainedCol(column: String, n: Long, nulls: Long,
      min: Option[String], max: Option[String], ndvEst: Long,
      degraded: Boolean = false)

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
      regs: DataFrame, degraded: Boolean = false): Unit = {
    import s.implicits._
    // registers first; the summary carries the covered stamp and is
    // the COMMIT point (see class scaladoc)
    regs.coalesce(1).write.mode("overwrite").parquet(regPath(dir, table))
    val covered = IndexStore.fingerprint(dir, table)
    sums.map { case (c, n, nulls, mn, mx) =>
        (c, n, nulls, mn, mx, covered, degraded) }
      .toDF("column", "n", "nulls", "min", "max", "covered", "degraded")
      .coalesce(1).write.mode("overwrite").parquet(sumPath(dir, table))
    // a rebuild at an UNCHANGED listing (reEnsure clearing the
    // degraded flag) must not be shadowed by the covered-keyed memo
    // (r16: the stamp alone cannot see an artifact rewrite)
    statsMemo.remove(maintPath(dir, table))
    ()
  }

  /** Build once from a full scan; safe to call when already current. */
  def ensure(s: SparkSession, dir: String, table: String): Unit =
    if (statsIfCurrent(s, dir, table).isEmpty) reEnsure(s, dir, table)

  /** Whether a maintained artifact EXISTS (current or stale) — the
    * bootstrap probe for ingest glue: absent → build from the table
    * so far; present → O(batch) maintenance (never a full rescan). */
  def built(dir: String, table: String): Boolean =
    IndexStore.artifactReady(sumPath(dir, table))

  /** [[built]] for the maintained key profile. */
  def keyProfileBuilt(dir: String, table: String, column: String): Boolean =
    IndexStore.artifactReady(s"${keyProfPath(dir, table, column)}/meta")

  /** Drop EVERY maintained artifact of (dir, table) — column stats,
    * key profiles, column groups, MCV lists (they all live under
    * [[maintPath]]). The LINEAGE-BREAK tombstone (r16 advice): an
    * ingest that replaced rows must make the break DURABLE before it
    * transitions its markers, so that any crash-replay state finds
    * the artifacts absent and REBUILDS — an O(batch) merge into
    * artifacts still carrying the replaced rows' contributions would
    * be wrong advisory stats stamped current. Idempotent; also clears
    * the plan-time memos so a same-process replay cannot serve the
    * dropped state. */
  def dropMaintained(dir: String, table: String): Unit = {
    val (fs, p) = IndexStore.fsOf(maintPath(dir, table))
    fs.delete(p, true)
    val prefix = maintPath(dir, table)
    statsMemo.keySet.removeIf(_.startsWith(prefix))
    keyProfMemo.keySet.removeIf(_.startsWith(prefix))
    grpMemo.keySet.removeIf(_.startsWith(prefix))
    mcvMemo.keySet.removeIf(_.startsWith(prefix))
  }

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
    // idempotent entry (r15, the column-group discipline): an
    // already-covered artifact is a no-op, so double calls never
    // double-count n/nulls; the registers-then-summary write order
    // makes the remaining crash windows converge on retry (the old
    // summary is re-read, the register merge is idempotent)
    if (statsIfCurrent(s, dir, table).isDefined) return
    require(built(dir, table),
      "maintained stats must be built (ensure) before appendMaintain")
    val old = readArtifact(s, dir, table).getOrElse {
      // built summary but unreadable registers = a crash tore the
      // registers overwrite mid-write; the repair is a full rebuild
      // (r15 self-review: the ingest glue replays this path forever
      // if it throws instead of converging)
      return reEnsure(s, dir, table)
    }
    val dtypes = graft.Tables(s, dir, table).schema
      .fields.map(f => f.name -> f.dataType).toMap
    val batchSums = summarize(batch).map(t => t._1 -> t).toMap
    // ROWCOUNT COHERENCE (r16 review #1): merging assumes the live
    // table = the covered listing + exactly this batch; a delete or
    // replacement that happened WITHOUT its deleteMaintain shows up
    // as n_old + |batch| ≠ |table| — a blind merge would stamp stats
    // (and their downstream consumers' trust) over rows that no
    // longer exist. Mismatch → full rebuild, metadata-speed counts.
    if (old.headOption.map(_.n).exists(oldN =>
        BigInt(oldN) + BigInt(batchSums.values.headOption.map(_._2)
          .getOrElse(batch.count())) !=
          BigInt(graft.Tables(s, dir, table).count())))
      return reEnsure(s, dir, table)
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
    // a degraded (delete-maintained) artifact stays degraded under
    // appends: the kept bounds remain valid bounds, but only a full
    // re-ANALYZE restores exactness (r16)
    writeArtifact(s, dir, table, mergedSums, merged,
      degraded = old.exists(_.degraded))
  }

  /** O(batch) DELETE maintenance (r16, the D42 gap between D91 and
    * the CDC family): the caller REMOVED `deleted`'s rows from the
    * table ALREADY (covered is taken from the post-delete listing).
    * Only the ADDITIVE fields retract exactly — n and nulls subtract
    * (clamped at 0: advisory, never negative). min/max and the NDV
    * registers provably cannot retract (register max-merge has no
    * inverse — the D42 max-merge argument), so they are KEPT as
    * documented one-sided bounds: stored min ≤ live min ≤ live max ≤
    * stored max (deletes only shrink the range) and the HLL estimate
    * is an UPPER bound on live NDV. The artifact marks itself
    * `degraded`; [[Steering.adviseAnalyze]] reports `degraded_stats`
    * for it, and a full [[reEnsure]] (or the next ensure after a
    * fingerprint move) restores exactness. Idempotent and
    * crash-convergent like [[appendMaintain]]: an already-covered
    * artifact no-ops; a crash between the (unchanged) registers
    * rewrite and the summary leaves the old summary — fail-closed
    * stale, the retry re-subtracts against the OLD counts exactly
    * once. A batch column the frame lacks follows the appendMaintain
    * convention (the scan served those rows' column as NULL). */
  def deleteMaintain(s: SparkSession, dir: String, table: String,
      deleted: DataFrame): Unit = {
    import s.implicits._
    if (statsIfCurrent(s, dir, table).isDefined) return
    require(built(dir, table),
      "maintained stats must be built (ensure) before deleteMaintain")
    val old = readArtifact(s, dir, table).getOrElse {
      return reEnsure(s, dir, table)
    }
    val batchSums = summarize(deleted).map(t => t._1 -> t).toMap
    val batchN = batchSums.values.headOption.map(_._2).getOrElse(0L)
    val mergedSums = old.map { m =>
      batchSums.get(m.column) match {
        case None =>
          (m.column, (m.n - batchN).max(0L), (m.nulls - batchN).max(0L),
            m.min, m.max)
        case Some((_, bn, bnulls, _, _)) =>
          (m.column, (m.n - bn).max(0L), (m.nulls - bnulls).max(0L),
            m.min, m.max)
      }
    }
    val oldRegs = s.read.parquet(regPath(dir, table))
      .as[(String, Long, Long)].collect().toSeq
    writeArtifact(s, dir, table, mergedSums,
      oldRegs.toDF("column", "reg", "rho"), degraded = true)
  }

  /** True when the maintained artifact is CURRENT but degraded (a
    * delete was maintained since the last full build) — the
    * [[Steering.adviseAnalyze]] probe. */
  def statsDegraded(s: SparkSession, dir: String, table: String): Boolean =
    statsIfCurrent(s, dir, table)
      .exists(_.values.exists(_.degraded))

  private def readArtifact(s: SparkSession, dir: String,
      table: String): Option[Seq[MaintainedCol]] = {
    if (!IndexStore.artifactReady(sumPath(dir, table)) ||
        !IndexStore.artifactReady(regPath(dir, table))) return None
    val ests = estimates(s, dir, table)
    val df = s.read.parquet(sumPath(dir, table))
    // pre-r16 artifacts lack the degraded column — they were never
    // delete-maintained, so false is exact, not a guess
    val hasDeg = df.schema.fieldNames.contains("degraded")
    Some(df.collect().toSeq.map { r =>
      MaintainedCol(r.getAs[String]("column"), r.getAs[Long]("n"),
        r.getAs[Long]("nulls"), Option(r.getAs[String]("min")),
        Option(r.getAs[String]("max")),
        ests.getOrElse(r.getAs[String]("column"), 0L),
        degraded = hasDeg && r.getAs[Boolean]("degraded"))
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

  // ------------------------------------------------------------------
  // MAINTAINED KEY PROFILES + COLUMN GROUPS (D94) — O(batch)
  // freshness for the two ADVISORY artifacts D91 left out (the r13
  // verdict's next-round #5): after one day of appends the exact
  // key profile (fingerprint-keyed) is unreachable and adviseJoin
  // loses its hot-key list — exactly the artifact whose absence
  // melts a reducer. Both ride algebras this file already ships:
  //
  //  - KEY PROFILE: the top-`trackK` (key, count) pairs maintained
  //    additively (Misra–Gries / space-saving family — public
  //    designs): an append sums the batch's per-key counts into the
  //    tracked set and re-takes the top-K. Keys outside the tracked
  //    set accumulate only from when they enter it, so a tracked
  //    count is a LOWER bound — fine for skew advice (a key the
  //    bound already calls hot IS hot; a slowly-warming key is
  //    caught within one tracking window), stated here because it
  //    is the one place maintenance trades exactness for O(batch).
  //    The serve threshold (`hotFreq`) is baked at build like the
  //    exact profile's, so advice reads need no caller knob.
  //  - COLUMN GROUP: tuple-NDV on the same deterministic HLL
  //    registers as the column sketches (hash of the
  //    null-sentineled tuple rendering), register MAX-merge per
  //    append — bit-identical to a rebuild, estimate keeps HLL
  //    error. Serves `exact = false` GroupStats: the estimator's
  //    correlated-GROUP-BY fix survives appends, while the FD
  //    PROOF face ([[StatsCatalog.determines]]) still demands the
  //    exact listing (spec-pinned).
  //
  // Same currency contract as the column stats: every artifact
  // carries the post-append listing fingerprint it covers and
  // serves only while that matches the live listing.
  // ------------------------------------------------------------------

  // keyprof2: the r15 stage/data/stamp layout is incompatible with the
  // r14 flat rows/meta one, and a warm host's old-layout artifact must
  // read as ABSENT (→ clean rebuild), never as torn (→ a crash-looping
  // require) — the fixture-version discipline applied to the artifact
  // path (r15 self-review)
  private def keyProfPath(dir: String, table: String, column: String) =
    s"${maintPath(dir, table)}/keyprof2_$column"
  private def grpPath(dir: String, table: String, cols: Seq[String]) =
    s"${maintPath(dir, table)}/grp_${cols.sorted.mkString("__")}"

  /** Build the maintained key profile from one full groupBy pass:
    * top `trackK` keys by count (ties by key ASC — deterministic),
    * with the serve threshold `hotFreq` baked into the artifact.
    * Idempotent while current. */
  def ensureKeyProfileMaint(s: SparkSession, dir: String, table: String,
      column: String, hotFreq: Long = 1000L, trackK: Int = 4096): Unit = {
    if (keyProfileReadIfCurrent(s, dir, table, column).isDefined) return
    val counts = graft.Tables(s, dir, table)
      .where(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("key"))
      .agg(count(lit(1)).as("freq"))
    writeKeyProf(s, dir, table, column, counts, hotFreq, trackK,
      graft.Tables(s, dir, table).count())
  }

  /** Commit one key-profile state, crash-convergently (r14 advice:
    * the old in-place rows overwrite made the rows file both the
    * merge INPUT and a pre-commit output — a crash between rows and
    * meta, then a retry, re-summed the batch into already-merged
    * counts). Now the rows and the covered stamp they were computed
    * for stage TOGETHER and land in ONE swap (`$p/data`), so a retry
    * can always discriminate "merged already" from "not yet"; the
    * meta (knobs + covered stamp, the SERVE point) lands last — and
    * SEPARATE from the rows, so an EMPTY tracked set still serves
    * and still remembers its baked thresholds (r14 review). */
  private def writeKeyProf(s: SparkSession, dir: String, table: String,
      column: String, counts: DataFrame, hotFreq: Long, trackK: Int,
      liveRows: Long): Unit = {
    import s.implicits._
    val p = keyProfPath(dir, table, column)
    val (fs, _) = IndexStore.fsOf(p)
    val covered = IndexStore.fingerprint(dir, table)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/stage"), true)
    counts
      .orderBy(col("freq").desc, col("key"))
      .limit(trackK)
      .coalesce(1).write.mode("overwrite").parquet(s"$p/stage/rows")
    // the stamp carries the COVERED ROW COUNT too (r16 review #1):
    // the tracked top-K cannot reconstruct the total, and the
    // append-maintain coherence check needs it (threaded in — review
    // pass 2: recounting here doubled the metadata jobs)
    Seq((covered, liveRows))
      .toDF("covered", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/stage/stamp")
    IndexStore.stageSwap(fs, s"$p/stage", s"$p/data")
    writeKeyProfMeta(s, p, covered, hotFreq, trackK)
  }

  private def writeKeyProfMeta(s: SparkSession, p: String, covered: String,
      hotFreq: Long, trackK: Int): Unit = {
    import s.implicits._
    Seq((covered, hotFreq, trackK))
      .toDF("covered", "hot_freq", "track_k")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
  }

  /** O(batch) profile maintenance, IDEMPOTENT under retries and
    * crash-convergent (r14 advice): the caller appended `batch`'s
    * rows ALREADY; this sums the batch's per-key counts into the
    * tracked set (tracked keys add, new keys enter at their batch
    * count) and re-takes the top-K — the batch is the only data
    * scanned; the old rows are a ≤trackK-row kilobyte frame. An
    * already-covered artifact is a no-op (double calls never
    * double-count); a crash between the data swap and the meta
    * commit is discriminated by the data's own covered stamp — the
    * retry sees rows already at the live listing and re-commits
    * only the meta, never re-merging the batch. */
  def appendMaintainKeyProfile(s: SparkSession, dir: String, table: String,
      column: String, batch: DataFrame): Unit = {
    import s.implicits._
    if (keyProfileReadIfCurrent(s, dir, table, column).isDefined) return
    val path = keyProfPath(dir, table, column)
    require(IndexStore.artifactReady(s"$path/meta"),
      "maintained key profile must be built (ensureKeyProfileMaint) before appendMaintainKeyProfile")
    val (fs, _) = IndexStore.fsOf(path)
    IndexStore.recoverSwap(fs, s"$path/stage", s"$path/data",
      readySubs = Seq("rows", "stamp"))
    require(IndexStore.artifactReady(s"$path/data/rows") &&
        IndexStore.artifactReady(s"$path/data/stamp"),
      "torn maintained key profile: rebuild with ensureKeyProfileMaint")
    // the baked knobs come from the meta — present even for an empty
    // tracked set, never silently reset to defaults
    val meta = s.read.parquet(s"$path/meta").head()
    val (hotFreq, trackK) =
      (meta.getAs[Long]("hot_freq"), meta.getAs[Int]("track_k"))
    val live = IndexStore.fingerprint(dir, table)
    val stampDf = s.read.parquet(s"$path/data/stamp")
    val stampRow = stampDf.head()
    val dataStamp = stampRow.getAs[String]("covered")
    if (dataStamp == live) {
      // the crash window: rows committed for this listing, meta (the
      // serve point) did not land — re-commit the meta, merge nothing
      writeKeyProfMeta(s, path, live, hotFreq, trackK)
      return
    }
    // ROWCOUNT COHERENCE (r16 review #1): tracked counts are lower
    // bounds of TRUE counts only while the table grew by exactly the
    // batches maintained; an out-of-band delete would make them
    // OVER-estimates ("a value the bound calls hot" might not be).
    // Pre-rows-stamp artifacts (missing field) rebuild once.
    val oldRows =
      if (stampDf.schema.fieldNames.contains("rows"))
        stampRow.getAs[Long]("rows")
      else -1L
    val liveRows = graft.Tables(s, dir, table).count()
    if (oldRows < 0 || BigInt(oldRows) + BigInt(batch.count()) !=
        BigInt(liveRows))
      return ensureKeyProfileMaint(s, dir, table, column, hotFreq, trackK)
    val old = s.read.parquet(s"$path/data/rows").select(col("key"), col("freq"))
      .as[(String, Long)].collect().toSeq
    val merged = batch
      .where(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("key"))
      .agg(count(lit(1)).as("freq"))
      .union(old.toDF("key", "freq"))
      .groupBy(col("key")).agg(sum(col("freq")).as("freq"))
    writeKeyProf(s, dir, table, column, merged, hotFreq, trackK, liveRows)
  }

  private def keyProfileReadIfCurrent(s: SparkSession, dir: String,
      table: String, column: String): Option[(Long, Seq[Row])] = {
    val path = keyProfPath(dir, table, column)
    if (!IndexStore.artifactReady(s"$path/meta") ||
        !IndexStore.artifactReady(s"$path/data/rows")) return None
    val live = IndexStore.fingerprint(dir, table)
    val cached = keyProfMemo.get(path)
    if (cached != null && cached._1 == live) return Some(cached._2)
    val meta = s.read.parquet(s"$path/meta").head()
    if (meta.getAs[String]("covered") != live) None
    else {
      val rows = s.read.parquet(s"$path/data/rows")
        .orderBy(col("freq").desc, col("key")).collect().toSeq
      val v = (meta.getAs[Long]("hot_freq"), rows)
      keyProfMemo.put(path, (live, v))
      Some(v)
    }
  }

  /** Serving face, shaped like [[StatsCatalog.keyProfile]]: (keys at
    * or above the baked hot threshold ranked by frequency, max
    * tracked frequency) while the artifact covers the live listing;
    * None otherwise. An EMPTY tracked set serves (Nil, 0) — "nothing
    * tracked" is an answer, not an absence. Counts are lower bounds
    * (see the block comment), so a served hot key is genuinely hot. */
  def keyProfileIfCurrent(s: SparkSession, dir: String, table: String,
      column: String, maxHot: Int = 1024): Option[(Seq[String], Long)] =
    keyProfileReadIfCurrent(s, dir, table, column).map { case (hotFreq, rows) =>
      val hot = rows.filter(_.getAs[Long]("freq") >= hotFreq)
        .take(maxHot).map(_.getAs[String]("key"))
      (hot, rows.headOption.map(_.getAs[Long]("freq")).getOrElse(0L))
    }

  // ------------------------------------------------------------------
  // MAINTAINED MCV LISTS (D105) — O(batch) freshness for the D92
  // most-common-value statistics, the r15 verdict's #1: the LEARNED
  // TIERS (D99) read [[StatsCatalog.mcvIfReady]], which is exact-
  // listing-keyed — one appended file stales it and the steering /
  // ordering tier silently reverts to uniform until a full
  // re-ANALYZE. Same space-saving top-K algebra as the maintained
  // key profile, applied to VALUES instead of join keys: an append
  // sums the batch's per-value counts into the tracked set and
  // re-takes the top trackK. A tracked count is a LOWER bound for
  // values that ever left the set — fine for BOTH consumers: the
  // estimator's MCV-hit equality under-corrects toward uniform
  // (never fabricates skew), and a value the bound calls hot IS hot
  // (the dispatch's salt-set argument). The serve face returns the
  // top `k` (baked at build — the exact MCV's contract) ranked
  // (freq DESC, value ASC), shaped exactly like mcvIfReady so every
  // consumer composes by orElse. Same currency contract and the
  // keyprof2 stage/data/stamp crash discipline.
  // ------------------------------------------------------------------

  private def mcvMaintPath(dir: String, table: String, column: String) =
    s"${maintPath(dir, table)}/mcv_$column"

  /** [[built]] for the maintained MCV list. */
  def mcvMaintBuilt(dir: String, table: String, column: String): Boolean =
    IndexStore.artifactReady(s"${mcvMaintPath(dir, table, column)}/meta")

  /** Build the maintained MCV list from one full groupBy pass: track
    * the top `trackK` values by count (ties by value ASC), serve the
    * top `k`. Idempotent while current. */
  def ensureMcvMaint(s: SparkSession, dir: String, table: String,
      column: String, k: Int = 32, trackK: Int = 4096): Unit = {
    require(k > 0 && trackK >= k, s"need trackK >= k > 0, got k=$k trackK=$trackK")
    if (mcvMaintReadIfCurrent(s, dir, table, column).isDefined) return
    val counts = graft.Tables(s, dir, table)
      .where(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("value"))
      .agg(count(lit(1)).as("freq"))
    writeMcvMaint(s, dir, table, column, counts, k, trackK,
      graft.Tables(s, dir, table).count())
  }

  /** Commit one maintained-MCV state — the [[writeKeyProf]] crash
    * discipline verbatim: rows + the covered stamp they were computed
    * for stage TOGETHER and land in ONE swap, the meta (knobs +
    * stamp, the SERVE point) last, so a retry can always discriminate
    * "merged already" from "not yet". */
  private def writeMcvMaint(s: SparkSession, dir: String, table: String,
      column: String, counts: DataFrame, k: Int, trackK: Int,
      liveRows: Long): Unit = {
    import s.implicits._
    val p = mcvMaintPath(dir, table, column)
    val (fs, _) = IndexStore.fsOf(p)
    val covered = IndexStore.fingerprint(dir, table)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/stage"), true)
    counts
      .orderBy(col("freq").desc, col("value"))
      .limit(trackK)
      .coalesce(1).write.mode("overwrite").parquet(s"$p/stage/rows")
    // covered row count in the stamp — the coherence check's input
    // (r16 review #1), the keyprof discipline; threaded in, never
    // recounted (review pass 2)
    Seq((covered, liveRows))
      .toDF("covered", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/stage/stamp")
    IndexStore.stageSwap(fs, s"$p/stage", s"$p/data")
    writeMcvMaintMeta(s, p, covered, k, trackK)
  }

  private def writeMcvMaintMeta(s: SparkSession, p: String, covered: String,
      k: Int, trackK: Int): Unit = {
    import s.implicits._
    Seq((covered, k, trackK)).toDF("covered", "k", "track_k")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/meta")
  }

  /** O(batch) MCV maintenance, IDEMPOTENT under retries and
    * crash-convergent (the [[appendMaintainKeyProfile]] argument,
    * value-grained): the caller appended `batch`'s rows ALREADY; this
    * sums the batch's per-value counts into the tracked set and
    * re-takes the top trackK — the batch is the only data scanned;
    * the old rows are a ≤trackK-row kilobyte frame. */
  def appendMaintainMcv(s: SparkSession, dir: String, table: String,
      column: String, batch: DataFrame): Unit = {
    import s.implicits._
    if (mcvMaintReadIfCurrent(s, dir, table, column).isDefined) return
    val path = mcvMaintPath(dir, table, column)
    require(IndexStore.artifactReady(s"$path/meta"),
      "maintained MCV must be built (ensureMcvMaint) before appendMaintainMcv")
    val (fs, _) = IndexStore.fsOf(path)
    IndexStore.recoverSwap(fs, s"$path/stage", s"$path/data",
      readySubs = Seq("rows", "stamp"))
    require(IndexStore.artifactReady(s"$path/data/rows") &&
        IndexStore.artifactReady(s"$path/data/stamp"),
      "torn maintained MCV: rebuild with ensureMcvMaint")
    val meta = s.read.parquet(s"$path/meta").head()
    val (k, trackK) = (meta.getAs[Int]("k"), meta.getAs[Int]("track_k"))
    val live = IndexStore.fingerprint(dir, table)
    val stampDf = s.read.parquet(s"$path/data/stamp")
    val stampRow = stampDf.head()
    val dataStamp = stampRow.getAs[String]("covered")
    if (dataStamp == live) {
      // crash window: rows committed for this listing, meta (the
      // serve point) did not land — re-commit the meta, merge nothing
      writeMcvMaintMeta(s, path, live, k, trackK)
      return
    }
    // rowcount coherence (r16 review #1) — the keyprof argument,
    // value-grained: an out-of-band delete would turn the tracked
    // lower bounds into over-estimates; mismatch → full rebuild
    val oldRows =
      if (stampDf.schema.fieldNames.contains("rows"))
        stampRow.getAs[Long]("rows")
      else -1L
    val liveRows = graft.Tables(s, dir, table).count()
    if (oldRows < 0 || BigInt(oldRows) + BigInt(batch.count()) !=
        BigInt(liveRows))
      return ensureMcvMaint(s, dir, table, column, k, trackK)
    val old = s.read.parquet(s"$path/data/rows")
      .select(col("value"), col("freq")).as[(String, Long)].collect().toSeq
    val merged = batch
      .where(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("value"))
      .agg(count(lit(1)).as("freq"))
      .union(old.toDF("value", "freq"))
      .groupBy(col("value")).agg(sum(col("freq")).as("freq"))
    writeMcvMaint(s, dir, table, column, merged, k, trackK, liveRows)
  }

  private def mcvMaintReadIfCurrent(s: SparkSession, dir: String,
      table: String, column: String): Option[(Int, Seq[(String, Long)])] = {
    val path = mcvMaintPath(dir, table, column)
    if (!IndexStore.artifactReady(s"$path/meta") ||
        !IndexStore.artifactReady(s"$path/data/rows")) return None
    val live = IndexStore.fingerprint(dir, table)
    val cached = mcvMemo.get(path)
    if (cached != null && cached._1 == live) return Some(cached._2)
    val meta = s.read.parquet(s"$path/meta").head()
    if (meta.getAs[String]("covered") != live) None
    else {
      val rows = s.read.parquet(s"$path/data/rows")
        .orderBy(col("freq").desc, col("value")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val v = (meta.getAs[Int]("k"), rows)
      mcvMemo.put(path, (live, v))
      Some(v)
    }
  }

  /** Serving face, shaped like [[StatsCatalog.mcvIfReady]]: the top
    * `k` (value, freq) pairs ranked (freq DESC, value ASC) while the
    * artifact covers the live listing; None otherwise. Frequencies
    * are LOWER bounds for values that ever left the tracked set (see
    * the block comment) — advisory-exact for both consumers. */
  def mcvMaintIfCurrent(s: SparkSession, dir: String, table: String,
      column: String): Option[Seq[(String, Long)]] =
    mcvMaintReadIfCurrent(s, dir, table, column).map { case (k, rows) =>
      rows.take(k)
    }

  /** Null-sentineled deterministic tuple rendering — the column-group
    * register hash input. concat_ws alone would collide (null, "x")
    * with ("x", null); the sentinel keeps the rendering injective on
    * tuples whose values avoid the control character. */
  private def tupleCol(cols: Seq[String]): org.apache.spark.sql.Column =
    concat_ws("\u0001",
      cols.sorted.map(c => coalesce(col(c).cast(StringType), lit("\u0000N"))): _*)

  private def grpRegisterRows(df: DataFrame, cols: Seq[String]): DataFrame = {
    import SketchRollup.{MaxRho, P}
    val label = cols.sorted.mkString(",")
    def rho(payload: org.apache.spark.sql.Column) =
      when(payload === 0L, lit(MaxRho))
        .otherwise(lit(MaxRho) - length(bin(payload)))
    val h = graft.functions.DetHash.hash60(tupleCol(cols), s"maintgrp_$label")
    df.select(lit(label).as("column"),
        h.bitwiseAND(lit((SketchRollup.M - 1).toLong)).as("reg"),
        rho(shiftright(h, P)).as("rho"))
      .groupBy(col("column"), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Build the maintained tuple-NDV group from one pass; idempotent
    * while current. */
  def ensureColumnGroupMaint(s: SparkSession, dir: String, table: String,
      columns: Seq[String]): Unit = {
    require(columns.size >= 2, "a column group needs at least 2 columns")
    if (columnGroupApproxIfCurrent(s, dir, table, columns).isDefined) return
    val df = graft.Tables(s, dir, table)
    writeGrpArtifact(s, dir, table, columns, df.count(),
      grpRegisterRows(df, columns))
  }

  private def writeGrpArtifact(s: SparkSession, dir: String, table: String,
      columns: Seq[String], n: Long, regs: DataFrame): Unit = {
    import s.implicits._
    val path = grpPath(dir, table, columns)
    // registers first, summary (with the covered stamp) last — the
    // torn-write discipline of the column artifact
    regs.coalesce(1).write.mode("overwrite").parquet(s"$path/registers")
    Seq((columns.sorted.mkString(","), n, IndexStore.fingerprint(dir, table)))
      .toDF("columns", "n", "covered")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/summary")
  }

  /** O(batch) group maintenance: register MAX-merge (exact vs a
    * rebuild) + row-count add; scans only the batch. IDEMPOTENT
    * (r14 advice): an already-covered artifact is a no-op, so a
    * double call (or a retry after the summary committed) never adds
    * the batch's count twice. The remaining crash windows converge:
    * a crash between the registers write and the summary write
    * leaves the OLD summary (old n, old covered stamp — fail-closed
    * stale), and the retry re-reads that old n and MAX-merges the
    * registers again (register merge is idempotent by algebra), so
    * the batch's count lands exactly once; a summary torn mid-write
    * fails `artifactReady` and the entry require(), repaired by a
    * full ensure rebuild — loud, never silently wrong. */
  def appendMaintainColumnGroup(s: SparkSession, dir: String, table: String,
      columns: Seq[String], batch: DataFrame): Unit = {
    import s.implicits._
    if (columnGroupApproxIfCurrent(s, dir, table, columns).isDefined) return
    val path = grpPath(dir, table, columns)
    require(IndexStore.artifactReady(s"$path/summary") &&
        IndexStore.artifactReady(s"$path/registers"),
      "maintained column group must be built (ensureColumnGroupMaint) before appendMaintainColumnGroup")
    val oldN = s.read.parquet(s"$path/summary").head().getAs[Long]("n")
    // rowcount coherence (r16 review pass 2: the one maintainer the
    // first pass missed) — the summary's own n is the covered total
    if (BigInt(oldN) + BigInt(batch.count()) !=
        BigInt(graft.Tables(s, dir, table).count()))
      return ensureColumnGroupMaint(s, dir, table, columns)
    val oldRegs = s.read.parquet(s"$path/registers")
      .as[(String, Long, Long)].collect().toSeq
    val merged = grpRegisterRows(batch, columns)
      .union(oldRegs.toDF("column", "reg", "rho"))
      .groupBy(col("column"), col("reg")).agg(max(col("rho")).as("rho"))
    writeGrpArtifact(s, dir, table, columns, oldN + batch.count(), merged)
  }

  /** Serving face for the ESTIMATOR's correlated-GROUP-BY fix:
    * approx GroupStats while current — `exact = false` by
    * construction, so the FD proof face can never consume it. */
  def columnGroupApproxIfCurrent(s: SparkSession, dir: String,
      table: String, columns: Seq[String]): Option[StatsCatalog.GroupStats] = {
    val path = grpPath(dir, table, columns)
    if (!IndexStore.artifactReady(s"$path/summary") ||
        !IndexStore.artifactReady(s"$path/registers")) return None
    val live = IndexStore.fingerprint(dir, table)
    val cached = grpMemo.get(path)
    if (cached != null && cached._1 == live) return Some(cached._2)
    val r = s.read.parquet(s"$path/summary").head()
    if (r.getAs[String]("covered") != live) None
    else {
      val est = grpEstimate(s, s"$path/registers")
      val g = StatsCatalog.GroupStats(columns.sorted, r.getAs[Long]("n"),
        est, exact = false)
      grpMemo.put(path, (live, g))
      Some(g)
    }
  }

  private def grpEstimate(s: SparkSession, regPath: String): Long = {
    val r = s.read.parquet(regPath)
      .agg(count(lit(1)).as("regs_hit"),
        sum(pow(lit(2.0), lit(SketchRollup.MaxRho) - col("rho")).cast("long"))
          .as("z_obs")).head()
    val hit = r.getAs[Long]("regs_hit")
    // the formula itself lives ONCE, in SketchRollup (r14 review)
    SketchRollup.estimateScalar(hit, if (hit == 0) 0L else r.getAs[Long]("z_obs"))
  }

  /** Stamp-keyed memos for the PLAN-TIME serving faces — the
    * [[StatsCatalog]] readStats discipline (r12 advice #1): the
    * estimator and the advice sites read these on every candidate
    * plan, and each uncached read is a Spark job (the register
    * estimate is an aggregation). Keyed on the COVERED fingerprint,
    * which each call still recomputes from live FS metadata (the
    * cheap, fail-closed part): a maintenance write changes covered →
    * re-read; a table mutation diverges covered from live → the
    * staleness check fails before the memo is consulted. */
  /** Test seam: a cold (post-crash) process has empty memos — the
    * crash-window specs model one by clearing them. */
  private[graft] def clearMemosForTest(): Unit = {
    statsMemo.clear(); keyProfMemo.clear(); grpMemo.clear(); mcvMemo.clear()
  }

  private val statsMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, MaintainedCol])]()
  private val keyProfMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Long, Seq[Row]))]()
  private val grpMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, StatsCatalog.GroupStats)]()
  private val mcvMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Int, Seq[(String, Long)]))]()

  /** The serving face: Some only while the artifact is intact AND
    * covers exactly the table's LIVE listing — an appended-but-not-
    * maintained file fails closed. */
  def statsIfCurrent(s: SparkSession, dir: String,
      table: String): Option[Map[String, MaintainedCol]] = {
    if (!IndexStore.artifactReady(sumPath(dir, table))) return None
    val live = IndexStore.fingerprint(dir, table)
    val memoKey = maintPath(dir, table)
    val cached = statsMemo.get(memoKey)
    if (cached != null && cached._1 == live) return Some(cached._2)
    val rows = s.read.parquet(sumPath(dir, table)).limit(1)
      .select(col("covered")).collect()
    val covered = rows.headOption.map(_.getString(0)).getOrElse(return None)
    if (covered != live) None
    else readArtifact(s, dir, table).map { cols =>
      val m = cols.map(c => c.column -> c).toMap
      statsMemo.put(memoKey, (covered, m))
      m
    }
  }
}
