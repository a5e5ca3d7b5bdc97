package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The decayed-rollup contract: the folded read equals a direct
  * integer recompute from raw events at every (as-of, horizon), the
  * query path never scans the events table, horizons beyond the data
  * weigh everything, and a late day's append folds in by SUM. */
class DecayedFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val DF = DecayedFeatures

  /** Direct integer recompute from the raw table (the oracle's
    * semantics in Scala). */
  private def direct(asOf: String, h: Int): Map[(String, Long), (Long, Long)] = {
    val asOfSec = MinMaxManifest.utc(asOf).toInstant.getEpochSecond
    val age = ((lit(asOfSec) - unix_timestamp(MinMaxManifest.utcDay($"ts")))
      / lit(86400L)).cast("long")
    graft.Tables(spark, sf, "events")
      .where(age >= 0 && age <= h)
      .groupBy($"event_type", ($"user_id" % DF.Cohorts).as("cohort"))
      .agg(count(lit(1)).as("n"),
        sum(floor($"value").cast("long") *
          pow(lit(2.0), (lit(h) - age).cast("double")).cast("long")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  private def folded(asOf: String, h: Int): Map[(String, Long), (Long, Long)] =
    DF.features(spark, sf, asOf, h).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("the rollup fold equals the raw recompute at several (as-of, horizon) points") {
    withIndexRoot("graft-decay-spec") {
      Seq(("2024-02-01 00:00:00", 20), ("2024-01-20 00:00:00", 7),
          ("2024-03-01 00:00:00", 45)).foreach { case (asOf, h) =>
        assert(folded(asOf, h) === direct(asOf, h),
          s"fold diverged from raw recompute at asOf=$asOf h=$h")
      }
    }
  }

  test("the read is scan-free: only the daily rollup is touched") {
    withIndexRoot("graft-decay-spec") {
      val df = DF.features(spark, sf, "2024-02-01 00:00:00", 20)
      val paths = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
      assert(paths.nonEmpty && paths.forall(_.contains("feat_daily")),
        s"the decayed read must touch only the rollup: $paths")
    }
  }

  test("a late day's append folds in by SUM") {
    withIndexRoot("graft-decay-append") {
      val before = folded("2024-02-01 00:00:00", 20)
      val late = Seq(
        (990001L, java.sql.Timestamp.valueOf("2024-01-28 12:00:00"),
          3L, "click", 100.0, "{}"),
        (990002L, java.sql.Timestamp.valueOf("2024-01-28 13:00:00"),
          3L, "click", 50.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      DF.appendBatch(spark, sf, late)
      val after = folded("2024-02-01 00:00:00", 20)
      val key = ("click", 3L)
      // age of Jan 28 as of Feb 1 is 4 days -> weight 2^(20-4)
      val w = 1L << 16
      assert(after(key)._1 === before(key)._1 + 2, "count must gain the batch")
      assert(after(key)._2 === before(key)._2 + 150L * w,
        "score must gain the weighted batch mass")
      // untouched cells identical
      (before.keySet - key).foreach(k => assert(after(k) === before(k)))
    }
  }

  test("an out-of-range horizon fails loudly instead of overflowing the fold") {
    withIndexRoot("graft-decay-guard") {
      // 2^(h-age) is exact in double only to k=50, and the BIGINT fold
      // overflows silently past it — the guard turns wrong-answers
      // into errors (r9 advice)
      intercept[IllegalArgumentException] {
        DF.features(spark, sf, "2024-02-01 00:00:00", 51)
      }
      intercept[IllegalArgumentException] {
        DF.featuresMaintained(spark, sf, "2024-02-01 00:00:00", -1)
      }
    }
  }

  test("CDC deletes retract as negative partials: maintained ≡ recompute-minus-deleted, replay idempotent") {
    withIndexRoot("graft-decay-deletes") {
      val (asOf, h) = ("2024-02-01 00:00:00", 20)
      val ev = graft.Tables(spark, sf, "events")
      val victim = ev.where($"event_type" === "click" &&
        $"user_id" % DF.Cohorts === 2L)
      DF.applyDeletes(spark, sf, victim, "del1")
      val maintained = DF.featuresMaintained(spark, sf, asOf, h).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // reference: the direct fold over events MINUS the deleted rows
      val asOfSec = MinMaxManifest.utc(asOf).toInstant.getEpochSecond
      val age = ((lit(asOfSec) - unix_timestamp(MinMaxManifest.utcDay($"ts")))
        / lit(86400L)).cast("long")
      val expected = ev
        .where(!($"event_type" === "click" && $"user_id" % DF.Cohorts === 2L))
        .where(age >= 0 && age <= h)
        .groupBy($"event_type", ($"user_id" % DF.Cohorts).as("cohort"))
        .agg(count(lit(1)).as("n"),
          sum(floor($"value").cast("long") *
            pow(lit(2.0), (lit(h) - age).cast("double")).cast("long")).as("s"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // the fully-retracted cell nets to (0, 0) in the maintained read
      // (it still appears — a released group with zero mass — so
      // compare on the expected keyset plus zero-mass leftovers)
      expected.foreach { case (k, v) =>
        assert(maintained(k) === v, s"maintained cell $k diverged")
      }
      (maintained.keySet -- expected.keySet).foreach { k =>
        assert(maintained(k) === ((0L, 0L)),
          s"fully-retracted cell $k must net to zero")
      }
      // replaying the same batch tag overwrites itself — idempotent
      DF.applyDeletes(spark, sf, victim, "del1")
      val replayed = DF.featuresMaintained(spark, sf, asOf, h).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(replayed === maintained, "a replayed delete batch must change nothing")
    }
  }

  test("stream batches fold in exactly-once: a checkpoint-replayed batch overwrites itself") {
    withIndexRoot("graft-decay-stream") {
      val (asOf, h) = ("2024-02-01 00:00:00", 20)
      val base = folded(asOf, h)
      val batch = Seq(
        (880001L, java.sql.Timestamp.valueOf("2024-01-30 10:00:00"),
          5L, "view", 60.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      DF.processStreamBatch(spark, sf, batch, batchId = 7L)
      def maintained() = DF.featuresMaintained(spark, sf, asOf, h).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val once = maintained()
      val key = ("view", 5L)
      val w = 1L << 18 // age of Jan 30 as of Feb 1 is 2 days
      assert(once(key)._1 === base(key)._1 + 1)
      assert(once(key)._2 === base(key)._2 + 60L * w)
      // the restart-between-write-and-commit replay: same batch id,
      // overwrite scoped to its own partition — no double count
      DF.processStreamBatch(spark, sf, batch, batchId = 7L)
      assert(maintained() === once, "a replayed stream batch must overwrite itself")
      // a NEW batch id accumulates
      DF.processStreamBatch(spark, sf, batch, batchId = 8L)
      val twice = maintained()
      assert(twice(key)._1 === base(key)._1 + 2)
      assert(twice(key)._2 === base(key)._2 + 120L * w)
    }
  }
}
