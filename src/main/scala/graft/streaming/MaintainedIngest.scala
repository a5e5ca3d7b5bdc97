package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.StatsMaintain

/** MAINTAINED STREAMING INGEST (D103) — the D91/D94 freshness story
  * wired to the streaming surface: at 100 TB the appends arrive as
  * micro-batches, and an advisory tier that goes stale between
  * nightly ANALYZE runs is exactly the artifact whose absence melts
  * a reducer (q84's lesson). Each micro-batch lands in its own
  * `batch_id` partition and then maintains the column stats and
  * (optionally) the hot-key profile at O(batch) — so the estimator,
  * the join advisor, and the transparent steering rule stay current
  * against a LIVE table with zero full scans after the initial
  * ensure.
  *
  * EXACTLY-ONCE under foreachBatch replays, argued window by window
  * (the r15 crash-idempotency of the maintenance faces is what makes
  * this composable):
  *
  *  - the batch's rows land under `batch_id=<id>` with DYNAMIC
  *    overwrite (the engine's BatchTables discipline): a replay
  *    REPLACES its own partition, so rows are never duplicated —
  *    but a replaced partition has new mtimes, which would make an
  *    already-maintained batch look like fresh data to the
  *    fingerprint-keyed maintenance guards;
  *  - therefore a LANDED MARKER (one FS file, created after the
  *    partition write commits) records that the partition is
  *    complete: a replay that finds the marker SKIPS the rewrite
  *    (listing unchanged), and the maintenance entry guards then
  *    see covered == live and no-op;
  *  - crash between write and marker → the replay rewrites the
  *    partition (replacing any partial files) and maintains once:
  *    the artifacts still cover the pre-batch listing, so the merge
  *    applies the batch exactly once;
  *  - crash between the stats maintain and the profile maintain →
  *    the replay skips the write (marker present), the stats guard
  *    no-ops (covered == live), and the profile maintains once.
  *
  * The marker precedes the maintains, so "no marker but maintained"
  * is unreachable — every replay state converges (spec-pinned). */
object MaintainedIngest {

  private def tablePath(dir: String, table: String) = s"$dir/$table.parquet"
  private def markerPath(dir: String, table: String, batchId: Long) =
    s"$dir/${table}_batches/batch_$batchId"

  /** The foreachBatch body (exposed for replay tests, the
    * StreamingDedup pattern). The FIRST batch bootstraps: with no
    * maintained artifact yet, ensure() builds from the table so far
    * (= exactly this batch); every later batch pays O(batch)
    * maintenance only. See the class scaladoc for the
    * window-by-window exactly-once argument. */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
      table: String, profileColumn: Option[String] = None,
      hotFreq: Long = 1000L): Unit = {
    val s = batch.sparkSession
    val withId = batch.withColumn("batch_id", lit(batchId))
    val marker = new org.apache.hadoop.fs.Path(markerPath(dir, table, batchId))
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      withId.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(tablePath(dir, table))
      fs.create(marker, true).close()
    }
    // both maintains are idempotent (r15): covered == live no-ops
    if (StatsMaintain.built(dir, table))
      StatsMaintain.appendMaintain(s, dir, table, withId)
    else StatsMaintain.ensure(s, dir, table)
    profileColumn.foreach { c =>
      if (StatsMaintain.keyProfileBuilt(dir, table, c))
        StatsMaintain.appendMaintainKeyProfile(s, dir, table, c, withId)
      else StatsMaintain.ensureKeyProfileMaint(s, dir, table, c, hotFreq)
    }
  }

  /** Wire a stream through the maintained ingest. */
  def run(rows: DataFrame, dir: String, table: String,
      checkpoint: String, profileColumn: Option[String] = None,
      hotFreq: Long = 1000L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    rows.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir, table, profileColumn, hotFreq)
      }
      .start()
}
