package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance: the retract/add path must equal a
  * full recompute over the post-CDC snapshot (the view-maintenance
  * contract), drop fully-deleted groups, stay stable under delta
  * replay, and keep the base scan behind a broadcast left-semi. */
class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private val groupCols = Seq("g")
  private val contribs = Seq(
    "n" -> lit(1L),
    "total" -> col("x").cast("long"))

  private def rollup(snapshot: DataFrame): DataFrame =
    snapshot.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("total"))

  private def collectRollup(df: DataFrame): Seq[(String, Long, Long)] =
    df.orderBy(col("g")).as[(String, Long, Long)].collect().toSeq

  private val base = Seq(
    (1L, "a", 10, 1), (2L, "a", 20, 1), (3L, "b", 30, 1),
    (4L, "b", 40, 1), (5L, "c", 50, 1))
    .toDF("k", "g", "x", "version")

  private val delta = Seq(
    (2L, "a", 25, 2, "upsert"),   // in-place update: a.total 30 -> 35
    (6L, "d", 60, 1, "upsert"),   // brand-new key in a brand-new group
    (3L, "b", 0, 2, "delete"),    // shrink group b
    (5L, "c", 0, 2, "delete"))    // delete c's ONLY row -> group drops
    .toDF("k", "g", "x", "version", "op")

  private def maintained(b: DataFrame = base, d: DataFrame = delta) =
    IncrementalRollup.maintain(rollup(b), b, d, "k", "version",
      groupCols, contribs, liveCount = "n")

  test("retract/add equals the full recompute of the post-CDC snapshot") {
    val incremental = collectRollup(maintained())
    val recomputed = collectRollup(
      rollup(SnapshotMerge.applyCdc(base, delta, "k", "version")))
    assert(incremental === recomputed)
    assert(incremental === Seq(
      ("a", 2L, 35L),   // updated in place
      ("b", 1L, 40L),   // one row deleted
      ("d", 1L, 60L)))  // new group; c fully deleted -> absent
  }

  test("replaying the delta against the maintained snapshot is a no-op") {
    val once = collectRollup(maintained())
    val snapshot1 = SnapshotMerge.applyCdc(base, delta, "k", "version")
    val again = collectRollup(
      IncrementalRollup.maintain(maintained(), snapshot1, delta, "k",
        "version", groupCols, contribs, liveCount = "n"))
    assert(again === once)
  }

  test("untouched groups pass through from the stored rollup unchanged") {
    // delta touching ONLY group a: b and c must flow through with their
    // stored values even though they never re-aggregate
    val narrow = Seq((1L, "a", 11, 2, "upsert"))
      .toDF("k", "g", "x", "version", "op")
    assert(collectRollup(maintained(d = narrow)) === Seq(
      ("a", 2L, 31L), ("b", 2L, 70L), ("c", 1L, 50L)))
  }

  test("the base retract scan is a broadcast left-semi on the delta keyset") {
    val plan = maintained().queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"), plan)
  }
}
