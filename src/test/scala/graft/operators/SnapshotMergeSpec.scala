package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot upsert: version wins, delta breaks ties (idempotent
  * replays), and the partition-pruning helper touches only
  * delta-adjacent partitions. */
class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  test("latestWins: highest version per key; delta wins version ties") {
    val base = Seq((1L, "old", 1), (2L, "keep", 5), (3L, "stale", 1))
      .toDF("k", "v", "version")
    val delta = Seq((1L, "new", 2), (2L, "replay", 5), (4L, "insert", 1))
      .toDF("k", "v", "version")
    val out = SnapshotMerge.latestWins(base, delta, "k", "version")
      .orderBy($"k").as[(Long, String, Int)].collect()
    assert(out.toSeq == Seq(
      (1L, "new", 2),      // higher version
      (2L, "replay", 5),   // tie -> delta (replay idempotence)
      (3L, "stale", 1),    // untouched
      (4L, "insert", 1)))  // new key
    assert(!out.map(_._1).groupBy(identity).exists(_._2.length > 1))
  }

  test("applyCdc: tombstone algebra — delete, reinsert above delete, stale delete no-op") {
    val base = Seq((1L, "live", 1), (2L, "live", 1), (3L, "live", 5),
      (4L, "keep", 1)).toDF("k", "v", "version")
    val delta = Seq(
      (1L, "x", 2, "delete"),      // tombstone above live → key gone
      (2L, "x", 2, "delete"),      // tombstone…
      (2L, "back", 3, "upsert"),   // …outranked by reinsert → key back
      (3L, "x", 2, "delete"),      // stale tombstone below live v5 → no-op
      (5L, "x", 9, "delete"))      // delete of a never-seen key → nothing
      .toDF("k", "v", "version", "op")
    val out = SnapshotMerge.applyCdc(base, delta, "k", "version")
      .orderBy($"k").as[(Long, String, Int)].collect()
    assert(out.toSeq === Seq(
      (2L, "back", 3),  // delete-then-reinsert ordering
      (3L, "live", 5),  // stale delete ignored
      (4L, "keep", 1))) // untouched
    // replaying the same delta is idempotent
    val replay = SnapshotMerge.applyCdc(base, delta.unionAll(delta), "k", "version")
      .orderBy($"k").as[(Long, String, Int)].collect()
    assert(replay.toSeq === out.toSeq)
  }

  test("resolution is deterministic for distinct rows sharing (key, version)") {
    // (version, origin) alone leaves this winner unspecified; the
    // row-hash tie-break must pick the same row regardless of input
    // order
    val base = Seq((1L, "base", 0)).toDF("k", "v", "version")
    val rows = Seq((1L, "alpha", 7), (1L, "beta", 7))
    val fwd = SnapshotMerge.latestWins(base, rows.toDF("k", "v", "version"),
      "k", "version").as[(Long, String, Int)].head()
    val rev = SnapshotMerge.latestWins(base, rows.reverse.toDF("k", "v", "version"),
      "k", "version").as[(Long, String, Int)].head()
    assert(fwd === rev)
  }

  test("touchedPartitionValues: only partitions holding delta keys") {
    val base = Seq((1L, "2024-01"), (2L, "2024-01"), (3L, "2024-02"),
      (4L, "2024-03")).toDF("k", "month")
    val delta = Seq((3L, "x"), (99L, "y")).toDF("k", "v")
    val touched = SnapshotMerge
      .touchedPartitionValues(base, delta, "k", col("month"))
      .as[String].collect().sorted
    assert(touched.toSeq == Seq("2024-02"))
  }
}
