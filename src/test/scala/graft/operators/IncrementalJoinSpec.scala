package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The join-IVM contract: for ANY two-way split of both inputs,
  * old-view ∪ₐₗₗ joinDelta is multiset-equal to the full recompute
  * (bag semantics — duplicates preserved exactly), and every leg of
  * the delta plan has a delta-side input (nothing recomputes the
  * old ⋈ old bulk). */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  // bag-semantics fixture: duplicate keys on BOTH sides (fan-out 2×2)
  private def aRows = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"),
    (5L, "a5"), (5L, "a6"))
  private def bRows = Seq((1L, "b1"), (1L, "b2"), (2L, "b3"), (4L, "b4"),
    (5L, "b5"))

  private def census(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy($"k", $"av", $"bv").agg(count(lit(1)).as("n"))
      .collect().map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}" -> r.getLong(3))
      .toMap

  test("maintained view equals full recompute for every split, duplicates included") {
    val a = aRows.toDF("k", "av")
    val b = bRows.toDF("k", "bv")
    val full = census(a.join(b, Seq("k")))
    // sweep splits: hash both sides into old/new by several moduli,
    // including splits where one delta is empty
    for (ma <- Seq(2L, 3L, 100L); mb <- Seq(2L, 5L, 100L)) {
      val (aOld, dA) = (a.where($"k" % ma =!= 0), a.where($"k" % ma === 0))
      val (bOld, dB) = (b.where($"k" % mb =!= 0), b.where($"k" % mb === 0))
      val maintained = aOld.join(bOld, Seq("k")).unionByName(
        IncrementalJoin.joinDelta(aOld, dA, bOld, dB, Seq("k")))
      assert(census(maintained) === full,
        s"IVM invariant broke at split ($ma, $mb)")
    }
  }

  test("applyFeed maintains a keyed join view under mixed upserts and deletes") {
    // A's history: version 1 = base, version 2 = a CDC batch with an
    // update (k=1), a delete (k=2), an insert (k=9); k=3 untouched
    val base = Seq((1L, 10L, "a1", 1L, "upsert"), (2L, 20L, "a2", 1L, "upsert"),
      (3L, 10L, "a3", 1L, "upsert"))
      .toDF("k", "jk", "av", "ver", "op")
    val delta = Seq((1L, 20L, "a1v2", 2L, "upsert"), (2L, 20L, "a2", 2L, "delete"),
      (9L, 10L, "a9", 2L, "upsert"))
      .toDF("k", "jk", "av", "ver", "op")
    val iv = SnapshotMerge.scd2Intervals(
      base.drop("op"), delta, "k", "ver")
    val b = Seq((10L, "b10"), (20L, "b20")).toDF("jk", "bv")
    def stateAt(v: Long) = iv.where(col("ver") <= v &&
        (col("valid_to").isNull || col("valid_to") > v) && col("alive"))
      .select($"k", $"jk", $"av")
    val view0 = stateAt(1L).join(b, Seq("jk"))
    val feed = SnapshotMerge.changeFeed(iv, "k", "ver", 1L, 2L)
      .select($"_change_type", $"k", $"jk", $"av")
    val maintained = IncrementalJoin.applyFeed(view0, feed, b, "k", Seq("jk"))
      .collect().map(_.toString).sorted.toSeq
    val recomputed = stateAt(2L).join(b, Seq("jk"))
      .collect().map(_.toString).sorted.toSeq
    assert(maintained === recomputed,
      s"feed-maintained view must equal the recompute:\n$maintained\nvs\n$recomputed")
    // and the update really moved: k=1 now enriches against jk=20
    assert(maintained.exists(r => r.contains("a1v2") && r.contains("b20")))
    assert(!maintained.exists(_.contains("a2")), "the deleted key must vanish")
  }

  test("every delta leg joins a delta side — the old x old bulk is never recomputed") {
    val a = aRows.toDF("k", "av")
    val b = bRows.toDF("k", "bv")
    val delta = IncrementalJoin.joinDelta(
      a.where($"k" % 2 =!= 0), a.where($"k" % 2 === 0),
      b.where($"k" % 2 =!= 0), b.where($"k" % 2 === 0), Seq("k"))
    val joins = delta.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size === 3, s"the delta algebra is exactly three joins, got ${joins.size}")
  }
}
