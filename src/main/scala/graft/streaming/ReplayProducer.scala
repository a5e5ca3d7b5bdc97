package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.taxi.Schemas

/** S11/T6 — the replay harness: turns a raw trips CSV into the JSON
  * stream the reference's Kafka producer emits
  * (`kafkaTaxiTripsProducer.py:15-51`), reproducing its two quirks:
  *  - event-time REWRITE: trip_start := now, trip_end := now +
  *    trip_seconds (T6 — the producer replays history as if live);
  *  - null/empty trip_seconds coerced to 0 before the rewrite.
  *
  * Spark-first design: rather than a row-at-a-time socket loop (the
  * reference throttles to ~20 msg/s with a sleep), the replay is a
  * DataFrame → JSON-lines transform dropped into a directory in
  * chunks — the file-source streaming idiom. A StreamingJob pointed at
  * `spark.readStream.text(dir)` consumes it exactly as it would a
  * Kafka topic; tests drop chunks to simulate arrival.
  */
object ReplayProducer {

  /** The raw CSV re-read with every field as a string — the producer
    * forwards the original text values, not parsed ones. */
  private val allStringSchema: StructType =
    StructType(Schemas.rawTrips.fields.map(f => StructField(f.name, StringType)))

  /** Build the replay JSON lines: one JSON object per trip, original
    * string values, timestamps rewritten to the given "now". */
  def replayFrame(spark: SparkSession, csvPath: String,
      now: java.time.Instant): DataFrame = {
    val fmt = "MM/dd/yyyy hh:mm:ss a"
    val raw = spark.read
      .option("header", true)
      .option("mode", "DROPMALFORMED")
      .schema(allStringSchema)
      .csv(csvPath)
    val secs = coalesce(col("trip_seconds").try_cast("int"), lit(0))
    val start = lit(java.sql.Timestamp.from(now))
    raw
      .withColumn("trip_seconds", secs.cast("string"))
      .withColumn("trip_start_timestamp", date_format(start, fmt))
      .withColumn("trip_end_timestamp",
        date_format(start + make_dt_interval(lit(0), lit(0), lit(0), secs.cast("double")), fmt))
      .select(to_json(struct(col("*"))).as("value"))
  }

  /** Write the replay as `chunks` JSON-lines files under `outDir` —
    * each file is one "micro-batch arrival" for a file-source stream. */
  def replayToDir(spark: SparkSession, csvPath: String, outDir: String,
      now: java.time.Instant, chunks: Int = 1): Unit =
    replayFrame(spark, csvPath, now)
      .repartition(chunks)
      .write.mode("append").text(outDir)

  /** The consuming side: a streaming frame of JSON lines from the
    * replay directory — plug-compatible with StreamingJob.parse. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
}
