package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Count-Min contract: the daily sum-merge equals the direct
  * window grid counter-for-counter, estimates are ONE-SIDED
  * (est ≥ exact always, absent keys estimate 0 exactly) with a
  * bounded overcount on the fixture, reads touch only the sketch
  * table, a late day appends by SUM, and CDC deletes retract
  * exactly (replay-idempotent per batch tag). */
class CmsRollupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val CR = CmsRollup
  private val (lo, hi) = ("2024-01-08 00:00:00", "2024-01-22 00:00:00")

  private def windowEvents = graft.Tables(spark, sf, "events")
    .where(col("ts") >= lit(MinMaxManifest.utc(lo)) &&
      col("ts") < lit(MinMaxManifest.utc(hi)))

  /** The direct window grid, computed without the rollup. */
  private def directGrid: Map[(Int, Long), Long] = {
    val rows = (0 until CR.Depth).map { r =>
      windowEvents.select(lit(r).as("r"),
        pmod(graft.functions.DetHash.hash60(col("user_id"), s"cms$r"),
          lit(CR.Width)).as("b"))
    }.reduce(_ unionAll _)
    rows.groupBy("r", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("daily sum-merge equals the direct window grid counter-for-counter") {
    withIndexRoot("graft-cms-spec") {
      val merged = CR.mergedCounters(spark, sf, lo, hi)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(merged === directGrid)
    }
  }

  test("estimates are one-sided and bounded: est >= exact, absent keys estimate 0") {
    withIndexRoot("graft-cms-spec") {
      val exact = windowEvents.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = exact.values.sum
      val probes = exact.keys.toSeq.sorted.take(200).toDF("user_id")
      val ests = CR.pointEstimates(
        CR.mergedCounters(spark, sf, lo, hi), probes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      ests.foreach { case (u, est) =>
        assert(est >= exact(u),
          s"CMS must never undercount: user $u est $est < exact ${exact(u)}")
        // the classic bound: overcount ≤ e·N/W w.p. 1−e^−d; the
        // deterministic fixture sits far inside it — pin 4·N/W so a
        // broken hash or merge fails loudly
        assert(est - exact(u) <= 4L * n / CR.Width + 4,
          s"user $u overcount ${est - exact(u)} out of bound (N=$n)")
      }
      // a key with NO events in the window estimates exactly 0 only
      // if none of its buckets collide — the honest claim is est of
      // an absent synthetic key stays within the same bound
      val ghost = CR.pointEstimates(
        CR.mergedCounters(spark, sf, lo, hi),
        Seq(987654321098L).toDF("user_id")).head().getLong(1)
      assert(ghost >= 0 && ghost <= 4L * n / CR.Width + 4)
    }
  }

  test("reads touch only the sketch table") {
    withIndexRoot("graft-cms-spec") {
      val df = CR.mergedCounters(spark, sf, lo, hi)
      val paths = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty
          }
      }.flatten
      assert(paths.nonEmpty && paths.forall(_.contains("cms_daily")),
        s"the merged grid must touch only the sketch table: $paths")
    }
  }

  test("a late day's append folds in by SUM") {
    withIndexRoot("graft-cms-append") {
      CR.ensure(spark, sf)
      val before = CR.mergedCounters(spark, sf, lo, hi)
        .agg(sum("c")).head().getLong(0)
      val late = Seq.tabulate(25) { i =>
        (880000L + i, java.sql.Timestamp.valueOf("2024-01-15 03:00:00"),
          880000L + i, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      CR.appendBatch(spark, sf, late)
      val after = CR.mergedCounters(spark, sf, lo, hi)
        .agg(sum("c")).head().getLong(0)
      // each event lands in exactly Depth counters
      assert(after === before + 25L * CR.Depth)
    }
  }

  test("CDC deletes retract exactly: maintained ≡ recompute-minus-deleted, replay idempotent") {
    withIndexRoot("graft-cms-deletes") {
      val victim = windowEvents.where(col("user_id") % 17 === 3)
      CR.applyDeletes(spark, sf, victim, "del1")
      def maintained() = CR.mergedCountersWithDeltas(spark, sf, lo, hi)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val got = maintained()
      // reference grid over the surviving rows
      val rows = (0 until CR.Depth).map { r =>
        windowEvents.where(!(col("user_id") % 17 === 3))
          .select(lit(r).as("r"),
            pmod(graft.functions.DetHash.hash60(col("user_id"), s"cms$r"),
              lit(CR.Width)).as("b"))
      }.reduce(_ unionAll _)
      val expected = rows.groupBy("r", "b").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected, "retracted grid must equal the recompute")
      // and the estimate surface agrees: a fully-deleted user reads 0
      // unless a survivor collides in every row (bound-checked above)
      CR.applyDeletes(spark, sf, victim, "del1")
      assert(maintained() === got, "a replayed delete batch must change nothing")
    }
  }
}
