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

  test("the retraction anti-join is hash-shaped in BOTH size regimes — never nested-loop, never forced broadcast") {
    val view = (1L to 50L).map(k => (k, k % 7, s"a$k", s"b${k % 7}"))
      .toDF("k", "jk", "av", "bv")
    val feed = Seq((2L, 2L, "a2", "delete"), (9L, 2L, "a9", "insert"))
      .toDF("k", "jk", "av", "_change_type")
    val b = (0L to 6L).map(j => (j, s"b$j")).toDF("jk", "bv")
    def antiShapes(threshold: String): Seq[String] = {
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      try {
        val out = IncrementalJoin.applyFeed(view, feed, b, "k", Seq("jk"))
        out.collect() // force AQE's final plan
        out.queryExecution.executedPlan.toString ::
          out.collect().map(_.toString).sorted.toList
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
    // small regime: the change-sized key set may auto-broadcast off
    // its own stats; bulk regime (broadcast off): it must degrade to
    // a shuffled hash/sort-merge anti-join — the un-forced hint's
    // whole point — and never a nested loop
    val small = antiShapes("10MB")
    val bulk = antiShapes("-1")
    def antiLines(planStr: String): Seq[String] =
      planStr.split('\n').filter(_.contains("LeftAnti")).toSeq
    assert(antiLines(small.head).nonEmpty && antiLines(bulk.head).nonEmpty,
      "expected a LeftAnti join in both plans")
    (antiLines(small.head) ++ antiLines(bulk.head)).foreach(l =>
      assert(!l.contains("NestedLoop"), s"anti-join must never nested-loop: $l"))
    antiLines(bulk.head).foreach(l =>
      assert(l.contains("ShuffledHashJoin") || l.contains("SortMergeJoin"),
        s"with broadcast disabled the anti-join must shuffle, not broadcast: $l"))
    assert(small.tail === bulk.tail, "both regimes compute the same view")
  }

  test("applyFeedPartitioned prunes the view probe to delta-adjacent partitions, maintained unchanged") {
    // a date-partitioned enriched view: 4 partitions, retractions in 1
    val viewRows = (1L to 40L).map(k =>
      (k, k % 7, s"d${k % 4}", s"a$k", s"b${k % 7}"))
    val dir = tmpDir("graft-ivmpart")
    viewRows.toDF("k", "jk", "day", "av", "bv")
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val view = spark.read.parquet(dir)
    val b = (0L to 6L).map(j => (j, s"b$j")).toDF("jk", "bv")
    // preimage rows carry the partition value of the rows they retract
    val feed = Seq(
      (5L, 5L, "d1", "a5", "delete"),
      (9L, 2L, "d1", "a9", "update_preimage"),
      (9L, 3L, "d1", "a9v2", "update_postimage"))
      .toDF("k", "jk", "day", "av", "_change_type")
    val pruned = IncrementalJoin.applyFeedPartitioned(
      view, feed, b, "k", Seq("jk"), "day")
    val flat = IncrementalJoin.applyFeed(view, feed, b, "k", Seq("jk"))
    assert(pruned.collect().map(_.toString).sorted.toSeq ===
      flat.collect().map(_.toString).sorted.toSeq,
      "partition pruning must not change the maintained view")
    // the plan pin: every scan of the partitioned view carries a
    // partition filter on `day` — the anti-join probe reads d1, the
    // pass-through complement reads NOT d1, and neither reads blind
    def collectScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectScans(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectScans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(collectScans)
    }
    val scans = collectScans(pruned.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("graft-ivmpart")))
    assert(scans.nonEmpty, "expected file scans of the partitioned view")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"every view scan must be partition-pruned:\n${f.partitionFilters}")
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
