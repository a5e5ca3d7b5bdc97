package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.operators.{IndexStore, ResultCache}

/** TRANSPARENT RESULT-CACHE SERVING as a Catalyst optimizer rule —
  * the last of the engine's serving tiers to go transparent (the r13
  * verdict's "API-level, not transparent" finding): rollup routing
  * (D50/D81), dictionary routing (D84) and FD reduction (D88) already
  * rewrite plans; with this rule a PUBLISHED query result serves the
  * next identical query whatever client wrote it — Snowflake's query
  * result reuse at the optimizer layer, a public design.
  *
  * Mechanics: [[ResultCache.publish]] writes an entry keyed by the
  * query's OPTIMIZED canonicalized plan ‖ source stamp (the form this
  * rule sees — `through`'s analyzed-plan keyspace is disjoint and
  * untouched). On every optimization, the rule keys the plan it was
  * handed; a READY entry whose schema matches substitutes the whole
  * plan with a scan of the entry, aliased back to the ORIGINAL output
  * exprIds so the query's schema is oblivious to the substitution.
  *
  * Exactness is the cache's own contract: the canonicalized key makes
  * any semantic difference a different entry, the source stamp makes
  * any mutated input a miss, and the uncacheable screen
  * (non-deterministic expressions, non-file leaves, subqueries
  * included) refuses the keyspace entirely — so the rule is
  * false-negative-safe: at worst the query computes normally.
  * CURRENT-TIME expressions need no screen in THIS keyspace: the
  * optimizer's ComputeCurrentTime freezes them to literals of the
  * query's moment before any user rule runs, so the evaluated
  * instant is part of the key — same-moment reuse is exact by
  * construction, a later moment re-keys (spec-pinned; contrast
  * `through`'s analyzed-plan keyspace, where the screen is load-
  * bearing because analysis has not yet frozen time).
  *
  * Guards, each fail-closed:
  *   - a plan already reading a result-cache entry never re-keys
  *     (the substituted plan's own optimization is a fixed point)
  *     and never publishes;
  *   - a schema mismatch between plan output and entry (names,
  *     types, arity) vetoes the substitution;
  *   - keying costs one canonicalization + one FS listing per
  *     optimization — the EnsureWatermark class of plan-time cost —
  *     and NO jobs (the entry read is schema inference only; rows
  *     load when the query executes).
  *
  * Scope note, stated like `through`'s: the key is the plan form the
  * optimizer hands user rules. If a later optimizer batch reshapes
  * the plan after this rule ran, publish (which keys the FINAL
  * optimized plan) and serve (which keys what it saw) could disagree
  * — the result is a MISS, never a wrong serve; the spec pins the
  * real shapes hitting. */
class TransparentResultCacheRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ResultCache.readsCache(plan)) return plan
    ResultCache.keyOf(plan) match {
      case Some(key) if IndexStore.artifactReady(ResultCache.cachePath(key)) =>
        val rel = spark.read.parquet(ResultCache.cachePath(key))
          .queryExecution.analyzed
        val compatible = rel.output.size == plan.output.size &&
          rel.output.zip(plan.output).forall { case (c, o) =>
            c.name == o.name && c.dataType == o.dataType
          }
        if (!compatible) plan
        else Project(
          rel.output.zip(plan.output).map { case (c, o) =>
            Alias(c, o.name)(exprId = o.exprId)
          }, rel)
      case _ => plan
    }
  }
}

object TransparentResultCache {
  /** Idempotently enable transparent result serving on `s`.
    * Exactness-preserving by the cache's keying contract, so leaving
    * it enabled is safe for every later query. */
  def enable(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.exists(
        _.isInstanceOf[TransparentResultCacheRule]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ new TransparentResultCacheRule(s)

  /** Test seam: remove the rule so plan-pinning suites sharing the
    * session don't see foreign substitutions. */
  private[graft] def disableForTest(s: SparkSession): Unit =
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[TransparentResultCacheRule])
}
