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
