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
    val existing = keep.map(c => p.masks.get(c).map(_.as(c)).getOrElse(col(c)))
    val derived = p.masks.toSeq.sortBy(_._1).collect {
      case (name, e) if !df.columns.contains(name) => e.as(name)
    }
    df.where(p.rowFilter).select(existing ++ derived: _*)
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
}
