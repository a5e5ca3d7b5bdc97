package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The KMV contract: the daily k-min-merge equals the direct window
  * sketch value-for-value (so replayed days are no-ops), estimates
  * land within sketch error of the exact counts, reads touch only
  * the sketch table, and the build's per-cell top-K runs under
  * WindowGroupLimit (heap-bounded, never a full cell sort). */
class KmvRollupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val KR = KmvRollup
  private val (lo, hi) = ("2024-01-05 00:00:00", "2024-01-25 00:00:00")

  private def windowEvents = graft.Tables(spark, sf, "events")
    .where(col("ts") >= lit(MinMaxManifest.utc(lo)) &&
      col("ts") < lit(MinMaxManifest.utc(hi)))

  test("daily k-min-merge equals the direct window sketch value-for-value") {
    withIndexRoot("graft-kmv-spec") {
      val merged = KR.mergedSketch(spark, sf, lo, hi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val direct = windowEvents
        .select(col("event_type"),
          pmod(graft.functions.DetHash.hash60(col("user_id"), "kmv"),
            lit(KR.M)).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("h"))))
        .where(col("rn") <= KR.K)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(merged === direct)
    }
  }

  test("estimates land within sketch error of the exact counts") {
    withIndexRoot("graft-kmv-spec") {
      val sk = KR.mergedSketch(spark, sf, lo, hi)
      val ests = KR.typeEstimates(sk).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = windowEvents.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("d")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ests.keySet === exact.keySet)
      exact.foreach { case (t, d) =>
        val e = ests(t)
        // KMV se ~ 1/sqrt(K) ~ 6%; allow 4 sigma (cells under K are
        // exact by construction and must match exactly)
        if (d < KR.K) assert(e === d, s"$t under-K cell must be exact")
        else assert(math.abs(e - d) <= d / 4.0,
          s"$t estimate $e too far from exact $d")
      }
      // intersection estimates vs exact overlap
      val pairs = KR.overlaps(sk).collect()
      assert(pairs.nonEmpty)
      val users = windowEvents.select(col("event_type"), col("user_id"))
        .distinct().collect()
        .groupBy(_.getString(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      pairs.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        val exactI = (users(a) & users(b)).size.toLong
        val est = r.getLong(4)
        assert(math.abs(est - exactI) <= math.max(20.0, exactI / 3.0),
          s"($a,$b) overlap estimate $est too far from exact $exactI")
      }
    }
  }

  test("reads touch only the sketch table; the merge is replay-idempotent") {
    withIndexRoot("graft-kmv-spec") {
      val df = KR.mergedSketch(spark, sf, lo, hi)
      val paths = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
      assert(paths.nonEmpty && paths.forall(_.contains("kmv_daily")),
        s"the merged sketch must touch only the sketch table: $paths")
      // replay a day on top of the artifact: distinct-then-rank must
      // swallow it (the idempotence HLL has and the histogram lacks)
      val before = df.collect().map(_.toString).sorted.toSeq
      val day = windowEvents.where(to_date(col("ts")) === "2024-01-10")
      KR.appendBatch(spark, sf, day)
      val after = KR.mergedSketch(spark, sf, lo, hi)
        .collect().map(_.toString).sorted.toSeq
      assert(after === before, "a replayed day must change nothing")
    }
  }

  test("appendBatch: a new batch folds in, equals a rebuild over the union, replays are no-ops") {
    withIndexRoot("graft-kmv-append") {
      KR.ensure(spark, sf)
      // genuinely NEW users on a day inside the read window — the
      // late-crawl shape the maintenance leg exists for
      val batch = Seq.tabulate(400) { i =>
        (7000000L + i, java.sql.Timestamp.valueOf("2024-01-15 06:00:00"),
          7000000L + i, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      KR.appendBatch(spark, sf, batch)
      val merged = KR.mergedSketch(spark, sf, lo, hi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // the rebuild-over-union reference, computed directly
      val direct = windowEvents.select(col("event_type"), col("user_id"))
        .unionAll(batch.select(col("event_type"), col("user_id")))
        .select(col("event_type"),
          pmod(graft.functions.DetHash.hash60(col("user_id"), "kmv"),
            lit(KR.M)).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("h"))))
        .where(col("rn") <= KR.K)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(merged === direct,
        "append must be bit-equal to rebuilding over corpus ∪ batch")
      // a checkpoint-replayed append adds exact-duplicate rows the
      // read-side distinct erases — no batch-id discipline needed
      KR.appendBatch(spark, sf, batch)
      val replayed = KR.mergedSketch(spark, sf, lo, hi)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(replayed === merged, "a replayed append must change nothing")
    }
  }

  test("the build's per-cell top-K runs under WindowGroupLimit") {
    withIndexRoot("graft-kmv-plan") {
      KR.ensure(spark, sf)
      val df = graft.Tables(spark, sf, "events").select(
          MinMaxManifest.utcDay(col("ts")).as("day"), col("event_type"),
          pmod(graft.functions.DetHash.hash60(col("user_id"), "kmv"),
            lit(KR.M)).as("h"))
        .distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("day"), col("event_type")).orderBy(col("h"))))
        .where(col("rn") <= KR.K)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"the rank<=K filter must push a group limit below the sort:\n$p")
    }
  }
}
