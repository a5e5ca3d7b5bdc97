package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** CARDINALITY FEEDBACK (D96) — the learning half of the engine
  * brain (DB2's LEO learning optimizer, SQL Server's CE feedback,
  * Oracle's statistics feedback — public designs): the Selinger
  * algebra (D82) is exactly as wrong as its independence and
  * uniformity assumptions, and the engine RUNS the queries it
  * mispredicts — every execution is a free, exact observation. This
  * object persists observed output cardinalities keyed the result
  * cache's way (canonicalized analyzed plan ‖ source stamp,
  * [[ResultCache.keyOf]]), and the estimator's opt-in feedback tier
  * serves an observation wherever the SAME canonical subtree — a
  * correlated filter, a fan-out join — appears again, inside any
  * larger plan.
  *
  * Why the result-cache keying is the right one:
  *  - the CANONICALIZED plan normalizes exprIds, so the observation
  *    recorded from a standalone `orders.where(cond)` serves the
  *    structurally identical Filter subtree inside tomorrow's
  *    five-way join — the LEO move;
  *  - the SOURCE STAMP makes staleness impossible, not detected: an
  *    appended or mutated table re-keys every affected observation
  *    to an unreachable path — the estimator falls back to the
  *    algebra, never to yesterday's count;
  *  - the uncacheable screen (non-file leaves, non-deterministic or
  *    current-time expressions) refuses the keyspace — a moving
  *    plan's count is not an invariant worth learning.
  *
  * Accuracy contract: an observation is EXACT for its subtree — the
  * feedback tier does not extrapolate (no scaling to "similar"
  * predicates, no decay); a near-miss is a miss. That keeps the
  * tier deterministic and oracle-replayable (q86 recomputes the
  * observed counts straight from the raw tables), the same
  * declared-algebra discipline as useColumnGroups/useMcv.
  *
  * Costs, stated: [[record]] executes the plan once (a count — the
  * maintenance-window pattern: record the workload's worst
  * misestimates, shaped like the ANALYZE advisor's report); serving
  * costs one canonicalization + one FS-metadata listing per plan
  * NODE per estimate (the EnsureWatermark class of plan-time cost)
  * and no jobs — the artifact is one kilobyte row read through a
  * stamp-keyed memo. [[sweep]] is the result-cache retention verbatim:
  * dead stamps are unreachable orphans, deleting a live entry only
  * re-misses. */
object CardFeedback {

  def feedbackPath(key: String): String =
    s"${IndexStore.root}/card_feedback/$key"

  /** Execute `df` once and persist its observed output cardinality
    * under its plan key. Returns the observation, or None for an
    * unkeyable plan (never recorded — see class scaladoc). Identical
    * re-records are idempotent overwrites of the same value. */
  def record(s: SparkSession, df: DataFrame): Option[Long] =
    ResultCache.keyOf(df.queryExecution.analyzed).map { key =>
      val n = df.count()
      import s.implicits._
      Seq(n).toDF("rows").coalesce(1)
        .write.mode("overwrite").parquet(feedbackPath(key))
      n
    }

  /** Stamp-keyed memo: the key embeds the source stamp, so a cached
    * positive can never go stale (a mutated source re-keys); only
    * positives memoize — an absent artifact may appear later. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The observed cardinality of `plan` if one was recorded for
    * exactly this canonical form over exactly these source files. */
  def observed(s: SparkSession, plan: LogicalPlan): Option[Long] =
    ResultCache.keyOf(plan).flatMap { key =>
      val hit = cache.get(key)
      if (hit != null) Some(hit.longValue())
      else {
        val path = feedbackPath(key)
        if (!IndexStore.artifactReady(path)) None
        else {
          val n = s.read.parquet(path).head().getAs[Long]("rows")
          cache.put(key, n)
          Some(n)
        }
      }
    }

  /** Retention: keep the newest `maxEntries` observations by mtime.
    * Deleting a live one only costs a fallback to the algebra. */
  def sweep(s: SparkSession, maxEntries: Int): Int = {
    val (fs, root) = IndexStore.fsOf(s"${IndexStore.root}/card_feedback")
    if (!fs.exists(root)) return 0
    val entries = fs.listStatus(root).filter(_.isDirectory)
      .sortBy(-_.getModificationTime)
    val victims = entries.drop(maxEntries)
    victims.foreach(st => fs.delete(st.getPath, true))
    victims.length
  }
}
