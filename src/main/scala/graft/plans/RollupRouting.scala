package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}

import graft.operators.HistogramRollup

/** MATERIALIZED-VIEW ROUTING as a Catalyst optimizer rule — the
  * query-rewrite layer every rollup store ships (Druid's datasource
  * rollups, BigQuery/Snowflake MV rewrite, Calcite's
  * `MaterializedViewRule` — all public designs): a user writes the
  * PLAIN aggregate over the raw table, and the optimizer substitutes
  * the kilobyte-sized persisted rollup when — and only when — the
  * rewrite is provably EXACT. Without this, the scan-free rollups
  * (q34/q36) only help callers who know to ask for them; with it, the
  * 100-TB dashboard query `SELECT event_type, count(*) FROM events
  * WHERE <day range> GROUP BY 1` plans as a bin-table read whatever
  * client wrote it.
  *
  * The matched shape is deliberately NARROW (exactness first):
  *
  *   Aggregate [event_type], [event_type?, count(1) AS …]
  *     (+- Project [attrs only])?
  *       +- Filter (isnotnull(ts)? AND ts >= L1 AND ts < L2)
  *         +- Relation …/events.parquet
  *
  * with L1/L2 timestamp LITERALS on UTC-midnight boundaries. Then
  * count-per-(event_type) over that window ≡ SUM of the daily
  * histogram bin counts ([[HistogramRollup]]'s table is built from
  * the same rows: day = zone-free UTC truncation, every row lands in
  * exactly one bin), so the rewrite is integer-exact — the q42 oracle
  * runs the RAW aggregate and the hash gate proves it. Non-matching
  * plans (extra predicates, other aggregates, non-aligned bounds,
  * computed columns, missing artifact) pass through untouched —
  * false-negative-safe, never false-positive.
  *
  * Output attributes keep the ORIGINAL exprIds (alias projection over
  * the spliced subtree), so parent operators (sorts, joins) are
  * oblivious to the substitution — the invariant any plan-rewrite
  * rule must hold. Enabled per session via [[RollupRouting.enable]]
  * (`spark.experimental.extraOptimizations`), or cluster-wide by
  * composing into an extensions class. */
class RollupRoutingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val MicrosPerDay = 86400L * 1000000L

  private def isDayAligned(l: Literal): Boolean = l.value match {
    case micros: java.lang.Long => micros % MicrosPerDay == 0L
    case _ => false
  }

  /** The relation's parent dir when the leaf is the raw events table. */
  private def eventsDir(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.toList match {
          case p :: Nil if p.getName == "events.parquet" =>
            Some(p.getParent.toString)
          case _ => None
        }
      case _ => None
    }

  /** Split a conjunction into its conjunct list. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Match Filter(ts-range) over the raw events relation, optionally
    * through pure-attribute Projects; return (dir, loMicros, hiMicros). */
  private def matchSource(plan: LogicalPlan): Option[(String, Long, Long)] =
    plan match {
      case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
        matchSource(child)
      case Filter(cond, rel: LogicalRelation) =>
        eventsDir(rel).flatMap { dir =>
          var lo: Option[Long] = None
          var hi: Option[Long] = None
          var clean = true
          conjuncts(cond).foreach {
            case IsNotNull(a: AttributeReference) if a.name == "ts" => ()
            case GreaterThanOrEqual(a: AttributeReference, l: Literal)
                if a.name == "ts" && isDayAligned(l) && lo.isEmpty =>
              lo = Some(l.value.asInstanceOf[Long])
            case LessThan(a: AttributeReference, l: Literal)
                if a.name == "ts" && isDayAligned(l) && hi.isEmpty =>
              hi = Some(l.value.asInstanceOf[Long])
            case _ => clean = false
          }
          if (clean) for (l <- lo; h <- hi) yield (dir, l, h) else None
        }
      case _ => None
    }

  private def tsOf(micros: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Seq(et: AttributeReference), aggExprs, child, _)
        if et.name == "event_type" =>
      // every output must be the grouping attr or a count(1) alias
      val shapeOk = aggExprs.forall {
        case a: AttributeReference => a.semanticEquals(et)
        case Alias(AggregateExpression(
            Count(Seq(Literal(1, _))), _, false, _, _), _) => true
        case _ => false
      }
      val routed = if (!shapeOk) None else matchSource(child).flatMap {
        case (dir, lo, hi) =>
          val histPath = HistogramRollup.histPath(dir)
          // routable = artifact ready AND still exactly ensure()'s
          // build (ensure-manifest watermark intact + listing match):
          // HistogramRollup.appendBatch maintains the table with
          // batches that are NOT in events.parquet, and the path's
          // fingerprint tracks only the raw table — after such an
          // append the rewrite would no longer be exact, so it must
          // veto itself (r8 advice, medium)
          if (!HistogramRollup.routable(histPath)) None
          else {
            // the exact substitute: SUM the daily bin counts over the
            // same UTC-instant window (kilobytes of bin IO for any
            // corpus size)
            val sub = spark.read.parquet(histPath)
              .where(col("day") >= lit(tsOf(lo)) && col("day") < lit(tsOf(hi)))
              .groupBy(col("event_type"))
              .agg(coalesce(sum(col("cnt")), lit(0L)).as("n"))
              .queryExecution.optimizedPlan
            val Seq(newEt, newN) = sub.output
            // preserve the ORIGINAL output attribute ids so parents
            // never see the substitution
            val projected = agg.aggregateExpressions.map {
              case a: AttributeReference =>
                Alias(newEt, a.name)(exprId = a.exprId)
              case al: Alias => Alias(newN, al.name)(exprId = al.exprId)
              case other => other
            }
            Some(Project(projected, sub))
          }
      }
      routed.getOrElse(agg)
  }
}

object RollupRouting {
  /** Idempotently enable routing on `s` (the rollup must exist or the
    * rule leaves plans untouched — build it with
    * [[HistogramRollup.ensure]]). Session-scoped and exactness-
    * preserving, so leaving it enabled is safe for every later query:
    * anything the matcher fires on is provably equal to its raw plan. */
  def enable(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.exists(
        _.isInstanceOf[RollupRoutingRule]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new RollupRoutingRule(s)

  /** Test seam: remove the rule so suites sharing one session don't
    * leak routing into unrelated plan pins. */
  private[graft] def disableForTest(s: SparkSession): Unit =
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[RollupRoutingRule])
}
