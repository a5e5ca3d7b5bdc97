package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE over the analyzed plan — the governance
  * primitive the row-policy/masking layer ([[graft.operators
  * .Governance]]) was missing: "which SOURCE columns does each output
  * column derive from?", the question behind PII taint audits,
  * impact analysis, and catalog lineage graphs (Unity Catalog /
  * OpenLineage / Marquez — public designs; this is the
  * expression-graph walk they all perform). Spark-first by
  * construction: the ANALYZED LogicalPlan already carries the full
  * derivation graph as Alias trees over Attribute references, so
  * lineage is a bottom-up fold over the plan — no parsing, no
  * instrumentation, exact for everything Catalyst can express.
  *
  * Semantics: DATA lineage, not control lineage — an output column's
  * sources are the leaf columns its VALUE can derive from (Alias
  * subtree references, generator inputs, union branch positions,
  * Expand projections). Filter/join PREDICATES deliberately do not
  * taint the columns they gate (the standard lineage-graph
  * convention: a `WHERE pii_id = 42` restricts rows but does not
  * copy pii bytes into any output column). Aggregates taint through
  * their child expressions; a COUNT(*) derives from nothing.
  *
  * Scale: this walks plan METADATA on the driver — cost is plan
  * size, never data size; usable as an admission gate before any
  * query runs. */
object ColumnLineage {

  /** Metadata key marking an Alias as a sanctioned DECLASSIFICATION
    * POINT (information-flow-control's public term): the alias'
    * output no longer carries its subtree's raw-column taint but a
    * label of the declassifier (`<label>.<name>`). [[graft.operators
    * .Governance.governed]] stamps its mask expressions with it — a
    * digest sanctioned by the policy is the policy's OUTPUT, not a
    * leak — so the publish gate ([[graft.operators.Governance
    * .assertPublishable]]) can refuse every OTHER path from a
    * protected column while the governed view's own products pass.
    * Only code that owns the policy should stamp this key; lineage
    * consumers see the declassifier label, so a stamped column is
    * auditable, never invisible. */
  val DeclassifyKey = "graft.lineage.declassify"

  /** Leaf label for a source column: `<table>.<col>`, where table is
    * the CATALOG IDENTIFIER when the relation has one (a
    * `spark.table(…)` read — e.g. the persisted bucketed edge tables
    * of [[graft.operators.GraphRank.ensureBucketedEdges]] — keeps its
    * database-qualified name, exactly where a catalog-lineage
    * consumer needs table identity), else the relation's root path
    * leaf name (e.g. `events.parquet`), else `local` for in-memory
    * relations. */
  private def leafLabel(rel: LogicalRelation): String =
    rel.catalogTable.map(_.identifier.unquotedString).getOrElse(
      rel.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.toList match {
          case p :: Nil => p.getName
          case ps => ps.map(_.getName).sorted.mkString("+")
        }
        case _ => "relation"
      })

  private def exprSources(e: org.apache.spark.sql.catalyst.expressions.Expression,
      env: Map[ExprId, Set[String]]): Set[String] =
    e.references.toSeq.flatMap(a => env.getOrElse(a.exprId, Set.empty[String])).toSet

  /** attr exprId → source-column labels, folded bottom-up. */
  private def fold(plan: LogicalPlan): Map[ExprId, Set[String]] = {
    val env: Map[ExprId, Set[String]] =
      plan.children.map(fold).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
    plan match {
      case r: LogicalRelation =>
        val t = leafLabel(r)
        env ++ r.output.map(a => a.exprId -> Set(s"$t.${a.name}"))
      case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        // DSv2 reads carry identity on the relation itself: the
        // catalog identifier when bound through one, else the
        // connector table's own name — never the opaque "relation"
        val t = v2.identifier.map(_.toString).getOrElse(v2.table.name())
        env ++ v2.output.map(a => a.exprId -> Set(s"$t.${a.name}"))
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        val t = h.tableMeta.identifier.unquotedString
        env ++ h.output.map(a => a.exprId -> Set(s"$t.${a.name}"))
      case lr: LocalRelation =>
        env ++ lr.output.map(a => a.exprId -> Set(s"local.${a.name}"))
      case u: Union =>
        // output attr i carries rows from EVERY branch's column i
        env ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.flatMap(c =>
            env.getOrElse(c.output(i).exprId, Set.empty)).toSet
        }
      case g: Generate =>
        val src = exprSources(g.generator, env)
        env ++ g.generatorOutput.map(a => a.exprId -> src)
      case ex: Expand =>
        env ++ ex.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> ex.projections.flatMap(p =>
            if (i < p.size) exprSources(p(i), env) else Set.empty[String]).toSet
        }
      case _ =>
        // every Alias anywhere in this node's expressions defines a
        // new attribute from its subtree's references — covers
        // Project, Aggregate, Window; bare Attributes pass through
        // under their existing exprId
        val derived = plan.expressions.flatMap(_.collect {
          case al: Alias if al.metadata.contains(DeclassifyKey) =>
            al.exprId -> Set(
              s"${al.metadata.getString(DeclassifyKey)}.${al.name}")
          case al: Alias => al.exprId -> exprSources(al.child, env)
        })
        env ++ derived
    }
  }

  /** Output column name → the set of `<table>.<col>` leaf columns it
    * derives from. */
  def sources(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val env = fold(plan)
    plan.output.map(a =>
      a.name -> env.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  /** The output columns tainted by any source column whose bare name
    * is in `piiCols` — the audit gate: refuse to publish a frame
    * whose untrusted outputs touch PII lineage. */
  def taintedBy(df: DataFrame, piiCols: Set[String]): Set[String] =
    sources(df).collect {
      case (out, srcs) if srcs.exists(s =>
        piiCols.contains(s.substring(s.lastIndexOf('.') + 1))) => out
    }.toSet
}
