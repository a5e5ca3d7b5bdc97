package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed-admission contract: the two-pass range-partitioned
  * prefix sum in [[CandidateBudget.admit]] must be BIT-IDENTICAL to
  * the single-task global running sum it replaced (same keep set,
  * same skipped keys, same skipped mass, at any budget), and its plan
  * must carry no empty-partitionSpec window — the single-task funnel
  * the rewrite exists to remove. */
class CandidateBudgetSpec extends SparkSpec {
  import spark.implicits._

  // skewed deterministic fixture: 500 buckets, masses 1..97 (knuth
  // multiplicative scatter), ASCII keys so Spark / local string
  // orderings agree
  private def fixture = (0 until 500).map { i =>
    (i % 7, f"sig$i%04d", (i * 2654435761L) % 97 + 1)
  }.toDF("band", "sig", "cand")

  /** The single-task reference: global (cand, band, sig) order,
    * running sum on the driver. */
  private def reference(budget: Long): (Set[(Int, String)], Set[(Int, String)], Long) = {
    val rows = fixture.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy { case (b, s, c) => (c, b, s) }
    var cum = 0L
    var skippedMass = 0L
    val keep = Set.newBuilder[(Int, String)]
    val skip = Set.newBuilder[(Int, String)]
    rows.foreach { case (b, s, c) =>
      cum += c
      if (cum <= budget) keep += ((b, s))
      else { skip += ((b, s)); skippedMass += c }
    }
    (keep.result(), skip.result(), skippedMass)
  }

  private def admitted(budget: Long): (Set[(Int, String)], Set[(Int, String)], Long) = {
    val adm = CandidateBudget.admit(fixture, Seq("band", "sig"), budget)
    (adm.keep.collect().map(r => (r.getInt(0), r.getString(1))).toSet,
      adm.skippedKeys.collect().map(r => (r.getInt(0), r.getString(1))).toSet,
      adm.skippedMass.head().getLong(0))
  }

  test("admissions are bit-identical to the single-task global window at every budget") {
    val total = fixture.agg(sum($"cand")).head().getLong(0)
    // budgets straddling nothing / a mid cut / everything
    Seq(0L, 1L, total / 10, total / 2, total - 1, total, total + 100).foreach { b =>
      val (k1, s1, m1) = admitted(b)
      val (k2, s2, m2) = reference(b)
      assert(k1 === k2, s"keep set diverged at budget $b")
      assert(s1 === s2, s"skipped keyset diverged at budget $b")
      assert(m1 === m2, s"skipped mass diverged at budget $b")
      assert(k1.size + s1.size === 500, s"keys must partition at budget $b")
    }
  }

  test("re-evaluation of the admission frames is stable and never re-runs the exchange") {
    // admit materializes the sliced frame (slice ids + local cums)
    // eagerly (localCheckpoint) — so repeated actions on keep read
    // the immutable checkpoint instead of recomputing the range
    // shuffle (the r8 advice: a recompute under a drifted upstream
    // AQE decision could mis-key the broadcast offsets), and no
    // window of any size appears in any consumer plan
    val adm = CandidateBudget.admit(fixture, Seq("band", "sig"), 5000L)
    val first = adm.keep.collect().map(_.toString).sorted.toSeq
    val second = adm.keep.collect().map(_.toString).sorted.toSeq
    assert(first === second, "re-evaluation must not shift admissions")
    val p = adm.keep.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"),
      s"keep must read the materialized admission, never the exchange:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"no consumer may be able to re-run the range exchange:\n$p")
    assert(!p.contains("Window"),
      s"consumers fold driver offsets, never re-run a window:\n$p")
    // the offsets arrive by broadcast over the checkpoint, never a
    // shuffle join
    assert(p.contains("BroadcastHashJoin"),
      s"per-slice offsets must broadcast-join back:\n$p")
  }

  test("an empty skipped tail is a local relation: consumer anti-joins fold away") {
    // at a budget covering everything, the skipped keyset is
    // provably empty — admit returns a LOCAL empty relation so
    // PropagateEmptyRelation removes the consumer's anti-join
    // entirely (the 100×-replica regression: a stats-less
    // checkpoint subtree made the EMPTY tail plan as a full
    // sort-merge shuffle of the corpus-bound left side)
    val total = fixture.agg(sum($"cand")).head().getLong(0)
    val adm = CandidateBudget.admit(fixture, Seq("band", "sig"), total + 1)
    assert(adm.skippedKeys.count() === 0L)
    val pruned = fixture.join(adm.skippedKeys, Seq("band", "sig"), "left_anti")
    assert(pruned.count() === 500L, "an empty tail must prune nothing")
    val p = pruned.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"),
      s"the anti-join against an empty tail must fold away:\n$p")
    // a NON-empty small tail broadcasts (never a corpus-side shuffle)
    val adm2 = CandidateBudget.admit(fixture, Seq("band", "sig"), total / 2)
    val pruned2 = fixture.join(adm2.skippedKeys, Seq("band", "sig"), "left_anti")
    pruned2.collect()
    val p2 = pruned2.queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"),
      s"a small skipped tail must broadcast into the anti-join:\n$p2")
  }

  test("no data-sized global window: every window is keyed by the range slice id") {
    // the only window in the whole admission is the per-slice LOCAL
    // cumulative sum in the one materialization job, PARTITIONED by
    // _pid — each task sees only its range slice of the data; the
    // offsets prefix is a driver fold over ≤ one row per shuffle
    // partition (cluster-width-bounded). No window may run over the
    // raw bucket order alone.
    val sliced = CandidateBudget.slicedFrame(fixture, Seq("band", "sig"))
    sliced.collect() // finalize the adaptive plan
    val p = sliced.queryExecution.executedPlan.toString
    val wlines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(wlines.nonEmpty, s"the cumulative window must exist:\n$p")
    wlines.foreach(l => assert(l.contains("_pid#"),
      s"every admission window must be keyed by the range slice id:\n$l"))
  }
}
