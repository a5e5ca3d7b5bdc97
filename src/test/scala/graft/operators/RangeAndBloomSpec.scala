package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomJoin semi-join reduction and IntervalJoin bucketed range join. */
class RangeAndBloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune: no false negatives — every joining row survives") {
    val big = (1L to 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 999L).toDF("sk")
    val pruned = BloomJoin.prune(big, "k", small, "sk", expectedItems = 10L)
    val kept = pruned.select($"k").as[Long].collect().toSet
    assert(Set(3L, 500L, 999L).subsetOf(kept),
      "a bloom filter must never drop a true match")
    // the sketch is doing real work: the overwhelming majority of
    // non-matching rows are gone (fpp 1% on 1000 rows ⇒ ~10 extras)
    assert(kept.size < 100, s"prune kept ${kept.size}/1000 rows — sketch inert")
    // composed with the exact join, results equal the plain join
    val composed = pruned.join(small, $"k" === $"sk").select($"k")
      .as[Long].collect().toSet
    assert(composed === Set(3L, 500L, 999L))
  }

  test("bloom prune: derived sizing holds fpp when the build side is large") {
    // No expectedItems hint: the sketch must size itself off the build
    // side. 20k distinct build keys vs a disjoint 20k-key probe side —
    // an undersized (fixed-hint) filter would saturate and pass nearly
    // everything; correctly derived bits keep the observed fp rate at
    // the ~1% target (3% asserted for headroom).
    val big = (100000L to 119999L).toDF("k") // disjoint from build keys
    val small = (1L to 20000L).toDF("sk")
    val kept = BloomJoin.prune(big, "k", small, "sk").count()
    assert(kept <= 600, s"observed $kept/20000 false positives (>3%)")
  }

  test("bloom prune: empty build side drops everything (inner-join semantics)") {
    val big = (1L to 50L).toDF("k")
    val small = Seq.empty[Long].toDF("sk")
    assert(BloomJoin.prune(big, "k", small, "sk", expectedItems = 1L).count() === 0L)
  }

  test("bloom prune: string keys hash consistently on both sides") {
    val big = Seq("a", "b", "c", "d").toDF("k")
    val small = Seq("b", "d").toDF("sk")
    val kept = BloomJoin.prune(big, "k", small, "sk", expectedItems = 2L)
      .select($"k").as[String].collect().toSet
    assert(Set("b", "d").subsetOf(kept))
  }

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("interval join: half-open [start, end), pairs matched exactly once") {
    val points = Seq(
      (1L, ts(0)),    // == start of w10 ⇒ inclusive
      (2L, ts(59)),   // inside w10
      (3L, ts(60)),   // == end of w10 ⇒ exclusive; == start of w20
      (4L, ts(200))). // in no window
      toDF("pid", "pts")
    val windows = Seq(
      (10L, ts(0), ts(60)),
      (20L, ts(60), ts(120)),
      (30L, ts(0), ts(120))). // overlaps both — points match MULTIPLE windows
      toDF("wid", "ws", "we")
    val got = IntervalJoin
      .pointInInterval(points, "pts", windows, "ws", "we", widthSec = 600L)
      .select($"pid", $"wid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (1L, 30L), (2L, 10L), (2L, 30L),
      (3L, 20L), (3L, 30L)),
      s"got $got")
  }

  test("interval join: intervals spanning many buckets still match (width << length)") {
    val points = Seq((1L, ts(500))).toDF("pid", "pts")
    val windows = Seq((9L, ts(0), ts(1000))).toDF("wid", "ws", "we")
    // width 60 s ⇒ the window fans out over ~17 buckets; the point's
    // single bucket must still meet it exactly once
    val got = IntervalJoin
      .pointInInterval(points, "pts", windows, "ws", "we", widthSec = 60L)
      .collect()
    assert(got.length === 1)
  }

  test("interval join: extra equi-keys scope the match") {
    val points = Seq(("u1", 1L, ts(30)), ("u2", 2L, ts(30)))
      .toDF("user", "pid", "pts")
    val windows = Seq(("u1", 100L, ts(0), ts(60))).toDF("user", "wid", "ws", "we")
    val got = IntervalJoin
      .pointInInterval(points, "pts", windows, "ws", "we",
        widthSec = 600L, keys = Seq("user"))
      .select($"pid", $"wid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 100L)), "u2's point must not match u1's window")
  }

  test("interval join: non-key column collisions are rejected with names") {
    val points = Seq((1L, ts(0))).toDF("x", "pts")
    val windows = Seq((2L, ts(0), ts(60))).toDF("x", "ws", "we")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.pointInInterval(points, "pts", windows, "ws", "we", 60L)
    }
    assert(e.getMessage.contains("x"))
  }
}
