package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming._
import graft.taxi.TransformJob

/** Runnable real-time-path demo: replay a raw trips CSV as the
  * producer's JSON feed (event time rewritten to now), drive the full
  * streaming pipeline from a file source, and land both branches:
  *
  *   runMain graft.tools.StreamingDemo <rawTripsCsv> <areasCsv> <workDir>
  *
  *  - enriched branch (the Kafka/Druid feed shape) → console-style
  *    memory table, printed;
  *  - archive branch → partitioned parquet with checkpoint;
  *  - 15-min rollup (batch-mode over the same replay) printed.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val Array(tripsCsv, areasCsv, workDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val now = java.time.Instant.now()
    ReplayProducer.replayToDir(spark, tripsCsv, s"$workDir/feed", now, chunks = 2)
    val areas = TransformJob.readAreas(spark, areasCsv)

    val cleaned = StreamingJob.clean(StreamingJob.parse(
      ReplayProducer.fileSource(spark, s"$workDir/feed")))
    val enriched = StreamingJob.enrich(StreamingJob.narrow(cleaned), areas)

    val q1 = StreamingJob.toKafkaPayload(enriched).writeStream
      .format("memory").queryName("demo_feed").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    val q2 = StreamingJob.parquetSinkWriter(cleaned, s"$workDir/archive",
      s"$workDir/ckpt", Trigger.AvailableNow()).start()
    q1.awaitTermination()
    q2.awaitTermination()

    println(s"[demo] enriched feed rows: ${spark.table("demo_feed").count()}")
    spark.table("demo_feed").show(3, truncate = false)
    val archived = spark.read.parquet(s"$workDir/archive")
    println(s"[demo] archived rows: ${archived.count()} " +
      s"(partitions: ${archived.select($"year", $"month").distinct().count()})")

    println("[demo] 15-min rollup of the replay window:")
    RealtimeRollup.rollup15min(StreamingJob.clean(StreamingJob.parse(
      ReplayProducer.replayFrame(spark, tripsCsv, now))))
      .orderBy($"window_start", $"taxi_id").show(10, truncate = false)
    spark.stop()
  }
}
