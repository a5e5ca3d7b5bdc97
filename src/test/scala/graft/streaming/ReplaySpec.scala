package graft.streaming

import graft.SparkSpec
import graft.taxi.{Fixture, TransformJob}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S11/T6 — replay harness: raw CSV → producer-shaped JSON with
  * event-time rewritten to "now", consumed by the full streaming
  * pipeline through a file source. */
class ReplaySpec extends SparkSpec {
  import spark.implicits._

  test("replay rewrites event time to now and coerces null trip_seconds to 0") {
    val dir = tmpDir("replay")
    val csv = Fixture.write(s"$dir/trips.csv", Fixture.rawTripsCsv)
    val now = java.time.Instant.parse("2023-06-15T10:00:00Z")
    val lines = ReplayProducer.replayFrame(spark, csv, now)
      .as[String].collect()
    assert(lines.length === 8)
    // all trips now "start" at the replay instant (12-hour format)
    assert(lines.forall(_.contains(""""trip_start_timestamp":"06/15/2023 10:00:00 AM"""")))
    // t3 had empty trip_seconds → 0 → end == start
    val t3 = lines.find(_.contains(""""trip_id":"t3"""")).get
    assert(t3.contains(""""trip_seconds":"0""""))
    assert(t3.contains(""""trip_end_timestamp":"06/15/2023 10:00:00 AM""""))
    // t1 (1500 s) ends 25 minutes later
    val t1 = lines.filter(_.contains(""""trip_id":"t1"""")).head
    assert(t1.contains(""""trip_end_timestamp":"06/15/2023 10:25:00 AM""""))
  }

  test("replayed stream flows through parse→clean→enrich via file source") {
    val dir = tmpDir("replay_e2e")
    val csv = Fixture.write(s"$dir/trips.csv", Fixture.rawTripsCsv)
    val areasCsv = Fixture.write(s"$dir/areas.csv", Fixture.areasCsv)
    val now = java.time.Instant.parse("2023-06-15T10:00:00Z")
    ReplayProducer.replayToDir(spark, csv, s"$dir/feed", now, chunks = 2)

    val areas = TransformJob.readAreas(spark, areasCsv)
    val enriched = StreamingJob.enrich(
      StreamingJob.narrow(StreamingJob.clean(
        StreamingJob.parse(ReplayProducer.fileSource(spark, s"$dir/feed")))),
      areas)
    val q = enriched.writeStream.format("memory").queryName("replay_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("replay_t")
    // 8 raw rows; inner enrich drops t4 (pickup 99), t6 (null areas);
    // t1's exact duplicate is NOT deduped in the stream path → 6 rows
    assert(out.count() === 6)
    // year/month now derive from the REWRITTEN event time
    val cleaned = StreamingJob.clean(
      StreamingJob.parse(ReplayProducer.replayFrame(spark, csv, now)))
    assert(cleaned.select("year").distinct().as[Int].collect().toSeq === Seq(2023))
  }
}
