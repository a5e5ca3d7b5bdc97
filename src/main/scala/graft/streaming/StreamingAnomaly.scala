package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming twin of q27's rolling z-score: anomaly alerts on a live
  * metric stream. Stage 1 is a watermarked daily tumbling-window
  * aggregate (append mode — a day emits once, when the watermark
  * closes it); stage 2 scores each closed day against the standing
  * per-key HISTORY table and appends it to that history — the same
  * foreachBatch batch-table pattern as [[StreamingDedup]], because the
  * history is a slowly-growing batch table the stream joins against,
  * not stream-stream state.
  *
  * Scoring frame: the trailing 7 CALENDAR days [day−7, day−1], drawn
  * from the history PLUS the batch's own earlier days (a RANGE frame
  * — the batch twin q27 uses a 7-ROW frame; on a dense daily series
  * they coincide, and the calendar variant is the join-friendly
  * formulation a history table wants). The frame never includes the
  * arriving day, so an anomalous day cannot suppress its own alert —
  * q27's exclusion rule — and the intra-batch side means a catch-up
  * batch closing many days at once scores each against its true
  * predecessors, not stale history.
  *
  * Exactly-once: Structured Streaming replays a micro-batch whose
  * writes landed but whose checkpoint commit did not, so both sinks
  * write into a `batch_id=<id>` partition under dynamic partition
  * overwrite, and the history read is bounded to batches BEFORE the
  * current id — a replay rewrites its own partitions and scores
  * against exactly the history the first attempt saw
  * (StreamingDedup's contract, spec-pinned here too).
  *
  * Scale shape: per batch the join ships O(batch × 7) history rows on
  * the key — never the full history. Retention: the history is
  * partitioned by batch_id, and the watermark guarantees closed days
  * never reappear, so batch ids are monotone in event time — dropping
  * the lowest batch_id partitions retires days beyond the frame
  * horizon as a partition delete, never a rewrite.
  */
object StreamingAnomaly {

  val historySchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("day", DateType),
    StructField("dv", DoubleType)))

  /** Standing history, tolerating first-batch emptiness; bounded to
    * batches strictly before `beforeBatch` for replay idempotence. */
  def readHistory(spark: SparkSession, historyDir: String,
      beforeBatch: Option[Long] = None): DataFrame =
    BatchTables.read(spark, historyDir, historySchema, beforeBatch)

  /** Score one batch of closed daily rows (key, day, dv): z over the
    * trailing [day−7, day−1] calendar days drawn from the history AND
    * the batch's own earlier days (a catch-up batch closing many days
    * at once must let day 17 see days 10–16 that arrived beside it —
    * the same intra-batch rule as StreamingDedup's self-check; without
    * it a backlog replay would score every day against stale history).
    * Alert at |round(z, 6)| > threshold with ≥3 supporting days —
    * the 6dp gate is q27's, so the twins flag identically; the
    * reported z is display-rounded to 3 like q27's output column.
    * Returns EVERY batch row: the frame predicate lives in the join
    * condition, so a key whose history is entirely out of frame still
    * yields its (n=0, abstain) row instead of vanishing. */
  def scoreBatch(batch: DataFrame, history: DataFrame,
      threshold: Double = 1.5): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val candidates = history
      .unionByName(batch.select($"key", $"day", $"dv"))
      .select($"key".as("hkey"), $"day".as("hday"), $"dv".as("hdv"))
    val stats = batch.join(candidates,
        $"key" === $"hkey" &&
          $"hday" >= date_sub($"day", 7) && $"hday" < $"day",
        "left")
      .groupBy($"key", $"day", $"dv")
      .agg(count($"hdv").as("n"), avg($"hdv").as("mu"),
        stddev_samp($"hdv").as("sd"))
    stats.select($"key", $"day", $"dv", $"n",
      when($"n" >= 3 && $"sd" > 0,
        round(($"dv" - $"mu") / $"sd", 3)).as("z"),
      coalesce(when($"n" >= 3 && $"sd" > 0,
        abs(round(($"dv" - $"mu") / $"sd", 6)) > threshold),
        lit(false)).as("flag"))
  }

  /** The foreachBatch body (exposed for replay tests): score against
    * the bounded history, write alerts + append the batch's rows to
    * the history, both into batch_id partitions (idempotent replay). */
  def processBatch(batch: DataFrame, batchId: Long,
      historyDir: String, outDir: String,
      threshold: Double = 1.5): Unit = {
    val spark = batch.sparkSession
    val in = batch.persist()
    // prune the standing history to the batch's frame horizon BEFORE
    // the join — the batch is materialized anyway, so the min-day
    // scalar is free, and the join then ships O(batch × 7) history
    // rows instead of every key's unboundedly-growing past
    val horizon = in.agg(min(col("day"))).head()
    val history = readHistory(spark, historyDir, Some(batchId))
    val pruned =
      if (horizon.isNullAt(0)) history
      else history.where(col("day") >= date_sub(lit(horizon.getDate(0)), 7))
    val scored = scoreBatch(in, pruned, threshold).persist()
    try {
      BatchTables.writeBatchPartition(scored, batchId, outDir)
      BatchTables.writeBatchPartition(
        in.select(historySchema.fieldNames.map(col).toIndexedSeq: _*),
        batchId, historyDir)
    } finally {
      scored.unpersist()
      in.unpersist()
      ()
    }
  }

  /** Wire a streaming (ts, key, value) source end to end: watermarked
    * daily tumbling windows (append — a day emits when closed), then
    * per-batch scoring against the standing history. */
  def run(events: DataFrame, historyDir: String, outDir: String,
      checkpoint: String, watermark: String = "1 day",
      threshold: Double = 1.5): StreamingQuery = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", "1 day").as("w"), $"key")
      .agg(round(sum($"value"), 6).as("dv"))
      .select($"key", to_date($"w.start").as("day"), $"dv")
    daily.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, historyDir, outDir, threshold)
      }
      .start()
  }
}
