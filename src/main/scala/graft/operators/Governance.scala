package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GOVERNANCE views — row-level security and column masking as plain
  * Catalyst views (the Lake Formation / Unity-style access layer's
  * public semantics, reduced to what any Spark session can enforce):
  * a PRINCIPAL's view of a table is the table behind a row filter,
  * with sensitive columns either DROPPED (absent from the schema —
  * selecting them fails at analysis, the strongest "no") or MASKED
  * (replaced by a derived expression such as a digest, which still
  * supports joins/distincts without exposing content).
  *
  * Why views and not copies: a governed COPY of 100 TB per principal
  * is the storage non-starter, and goes stale the moment the table
  * appends. The view is a lazy projection+filter — zero extra bytes,
  * always current, and Catalyst pushes the principal's own
  * predicates THROUGH it to the scan (spec-pinned), so governance
  * costs nothing at plan time. Enforcement boundary is the session
  * catalog (a direct file-path read bypasses any engine-level
  * governance — real deployments pair this with storage ACLs; the
  * semantics here are the engine's half of that contract). */
object Governance {

  /** A principal's policy over one table. `masks` replace a column's
    * VALUES (same name, derived expression); `dropCols` remove the
    * column from the schema entirely. */
  final case class Policy(
      principal: String,
      rowFilter: Column,
      masks: Map[String, Column] = Map.empty,
      dropCols: Seq[String] = Seq.empty)

  /** The governed frame: filter, then per-column mask-or-keep, with
    * dropped columns gone; a mask whose name is NOT an existing
    * column becomes a derived stand-in (e.g. a digest replacing a
    * dropped raw column). One projection + one filter — no join, no
    * shuffle, nothing for the optimizer to stumble on. */
  def governed(df: DataFrame, p: Policy): DataFrame = {
    val keep = df.columns.filterNot(p.dropCols.contains)
    val existing = keep.map(c =>
      p.masks.get(c).map(_.as(c, maskMeta(p))).getOrElse(col(c)))
    val derived = p.masks.toSeq.sortBy(_._1).collect {
      case (name, e) if !df.columns.contains(name) => e.as(name, maskMeta(p))
    }
    df.where(p.rowFilter).select(existing ++ derived: _*)
  }

  /** The declassification stamp [[governed]] puts on its mask
    * expressions: a policy-sanctioned digest is the policy's OUTPUT,
    * so lineage records it as `mask[<principal>].<col>` instead of
    * the raw column it digests — the hinge [[assertPublishable]]
    * turns on. */
  private def maskMeta(p: Policy): org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putString(graft.plans.ColumnLineage.DeclassifyKey,
        s"mask[${p.principal}]")
      .build()

  /** LINEAGE-ENFORCED PUBLISH GATE — the composition of this layer
    * with [[graft.plans.ColumnLineage]] (the r11 verdict's ask: two
    * parallel features become one enforcement point): a frame may be
    * published under policy `p` only if NO output column's data
    * lineage reaches a protected column — anything `p` drops, or any
    * raw column `p`'s masks read — through any path OTHER than the
    * policy's own declassification-stamped mask expressions. Refused
    * AT PLAN TIME (the lineage fold walks plan metadata; nothing
    * executes), so `md5(col("text"))` hand-built over the RAW table
    * is rejected even though its VALUES would equal the sanctioned
    * view's — the gate checks provenance, not plausibility. Returns
    * the frame for chaining when clean. */
  def assertPublishable(df: DataFrame, p: Policy): DataFrame = {
    val maskRefs = p.masks.values
      .map(org.apache.spark.sql.graftbridge.columnToExpr)
      .flatMap(_.collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.name
    })
    val protectedCols = (p.dropCols ++ maskRefs).toSet
    val tainted = graft.plans.ColumnLineage.taintedBy(df, protectedCols)
    require(tainted.isEmpty,
      s"refusing to publish for principal ${p.principal}: output " +
        s"column(s) ${tainted.toSeq.sorted.mkString(", ")} derive from " +
        s"protected column(s) {${protectedCols.toSeq.sorted.mkString(", ")}} " +
        "outside the policy's own masks — build from the governed view")
    df
  }

  /** The demo policy the registered query and catalog use: an
    * "analyst" principal over `documents` — restricted sources
    * (numeric suffix ≡ 0 mod 4) are row-filtered out, raw `text` is
    * dropped, and a `text_sha` digest column stands in for it
    * (joinable/distinct-able, not readable). The rule is arithmetic
    * on the source id so it holds at every SF and replays in SQL. */
  def analystPolicy: Policy = Policy(
    principal = "analyst",
    rowFilter = !(substring(col("source"), 4, 10).cast("int") % 4 === 0),
    masks = Map("text_sha" -> md5(col("text").cast("binary"))),
    dropCols = Seq("text"))

  /** Governed documents for the analyst principal. */
  def analystDocuments(s: SparkSession, dir: String): DataFrame =
    governed(graft.Tables(s, dir, "documents"), analystPolicy)

  /** Register the governed view in the session catalog — the
    * dashboard-facing face: `spark.sql("... FROM documents_analyst")`. */
  def registerAnalystView(s: SparkSession, dir: String): Unit =
    analystDocuments(s, dir).createOrReplaceTempView("documents_analyst")

  /** One rung of a K-ANONYMITY generalization ladder: the
    * quasi-identifier projection at this coarseness, as (name,
    * expression) pairs over the source frame. Rung order is finest
    * first; every rung must project the SAME column names. */
  final case class QiLevel(level: Int, qi: Seq[(String, Column)])

  /** K-ANONYMITY via global recoding with suppression — the other
    * half of the governance story (q40/q41 control WHO sees WHICH
    * rows/columns; this controls what an aggregate RELEASE may reveal
    * about individuals — the Samarati/Sweeney model every privacy
    * review asks for before a dataset leaves the boundary):
    *
    *  1. group rows by the FINEST quasi-identifier projection; groups
    *     with ≥ k members release at that rung;
    *  2. rows stranded in small groups re-group under the next
    *     (coarser) rung — group sizes counted over the STRANDED rows
    *     only (releasing them alongside rung-0 releases would leak
    *     the finer split: a rung-1 group that overlaps a released
    *     rung-0 group differences to < k individuals);
    *  3. rows still stranded after the last rung are SUPPRESSED, and
    *     only their COUNT is released.
    *
    * Output: one row per released group — (level, qi…, n) — plus one
    * suppressed-total row, so the release is group-sized, never
    * row-sized. Every released n is ≥ k by construction (spec-pinned,
    * along with mass conservation: Σ released + suppressed = |rows|).
    *
    * Scale shape: each rung is one hash aggregate over group keys
    * plus one left_anti join against the PREVIOUS rung's released
    * keys — the anti side is group-cardinality, not row-cardinality,
    * so the planner (or AQE, at runtime size) broadcasts it when it
    * fits; the join strategy is deliberately NOT forced (the r9
    * advice: a hint would pin a driver OOM at 100-TB group
    * cardinality, where a shuffled anti-join is the correct
    * degradation). No windows, no sorts, shuffle mass = group keys.
    * At 100 TB this is exactly as expensive as the groupBys a
    * release aggregation runs anyway.
    *
    * NULLABLE QI columns are handled null-safely: groupBy groups null
    * keys into one group, so the anti-join that strands unreleased
    * rows must match null keys too (`<=>`); a plain equality anti
    * would re-release every row of a released null-key group at the
    * next rung and break mass conservation (the r9 advice's
    * double-count). */
  def kAnonymize(df: DataFrame, levels: Seq[QiLevel], k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one QI level")
    val names = levels.head.qi.map(_._1)
    require(levels.forall(_.qi.map(_._1) == names),
      "every QI level must project the same column names")
    require(names.forall(n => !df.columns.contains(n)),
      "QI names must not shadow source columns (rows are carried " +
        "at source grain between rungs)")
    var released: Option[DataFrame] = None
    // rows still unreleased, carried at SOURCE grain between rungs so
    // every rung can compute its own (coarser) QI projection
    var rest = df
    levels.foreach { lvl =>
      val keyed = rest.select(
        rest.columns.map(col) ++ lvl.qi.map { case (n, e) => e.as(n) }: _*)
      val g = keyed.groupBy(names.map(col): _*).agg(count(lit(1)).as("n"))
      val relKeys = g.where(col("n") >= k).select(names.map(col): _*)
      // released QI values surface as STRINGS: rungs generalize the
      // same logical attribute to different types (day date vs month
      // prefix), and the suppressed row's '*' must union cleanly
      val rel = g.where(col("n") >= k)
        .select(lit(lvl.level).as("level") +:
          names.map(n => col(n).cast("string").as(n)) :+ col("n"): _*)
      released = Some(released.map(_.unionAll(rel)).getOrElse(rel))
      // strand the rows of small groups for the next rung: anti-join
      // the ROWS against the released group keys at THIS rung's
      // projection (group-cardinality right side — the planner/AQE
      // broadcasts it when it fits). Null-safe equality so a released
      // null-key group strands its rows like any other.
      val relK = relKeys.select(names.map(n => col(n).as("__rel_" + n)): _*)
      val cond = names.map(n => keyed(n) <=> relK("__rel_" + n)).reduce(_ && _)
      rest = keyed
        .join(relK, cond, "left_anti")
        .drop(names: _*)
    }
    val suppressed = rest.agg(coalesce(count(lit(1)), lit(0L)).as("n"))
      .select(lit(levels.last.level + 1).as("level") +:
        names.map(n => lit("*").as(n)) :+ col("n"): _*)
    released.get.unionAll(suppressed)
  }
}
