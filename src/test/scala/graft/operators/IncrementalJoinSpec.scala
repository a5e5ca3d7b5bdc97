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
