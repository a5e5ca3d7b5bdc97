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

  test("countDistinct aux: delete-to-zero evicts the value; survivors keep it") {
    // group g carries value v via TWO rows and value w via ONE;
    // deleting one v-carrier must NOT change distinct, deleting the
    // last must
    val b = Seq(
      (1L, "g", "v", 1), (2L, "g", "v", 1), (3L, "g", "w", 1),
      (4L, "h", "v", 1))
      .toDF("k", "grp", "value", "version")
    val aux0 = IncrementalRollup.buildDistinctAux(b, Seq("grp"), "value")
    def view(aux: DataFrame): Seq[(String, Long, Long)] =
      IncrementalRollup.distinctView(aux, Seq("grp"), "value")
        .orderBy(col("grp")).as[(String, Long, Long)].collect().toSeq
    assert(view(aux0) === Seq(("g", 2L, 3L), ("h", 1L, 1L)))
    // round 1: delete ONE of g's two v-carriers — v still counted
    val d1 = Seq((1L, "g", "v", 2, "delete")).toDF("k", "grp", "value", "version", "op")
    val aux1 = IncrementalRollup.maintainDistinct(
      aux0, b, d1, "k", "version", Seq("grp"), "value")
    assert(view(aux1) === Seq(("g", 2L, 2L), ("h", 1L, 1L)),
      "a value with surviving carriers must keep counting")
    // round 2: delete the LAST v-carrier in g — v evicts, distinct drops
    val s1 = SnapshotMerge.applyCdc(b, d1, "k", "version")
    val d2 = Seq((2L, "g", "v", 3, "delete")).toDF("k", "grp", "value", "version", "op")
    val aux2 = IncrementalRollup.maintainDistinct(
      aux1, s1, d2, "k", "version", Seq("grp"), "value")
    assert(view(aux2) === Seq(("g", 1L, 1L), ("h", 1L, 1L)),
      "deleting the last carrier must evict the value from the distinct count")
    assert(aux2.where(col("grp") === "g" && col("value") === "v").count() === 0L,
      "the zero-count aux cell must be physically dropped")
    // and the maintained aux equals a full rebuild of the post-CDC aux
    val s2 = SnapshotMerge.applyCdc(s1, d2, "k", "version")
    val rebuilt = IncrementalRollup.buildDistinctAux(s2, Seq("grp"), "value")
      .orderBy(col("grp"), col("value")).collect().map(_.toString).toSeq
    val maintainedAux = aux2.orderBy(col("grp"), col("value"))
      .collect().map(_.toString).toSeq
    assert(maintainedAux === rebuilt,
      "maintained aux must be bit-equal to the full rebuild")
  }

  test("the base retract scan is a broadcast left-semi on the delta keyset") {
    val plan = maintained().queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"), plan)
  }
}
