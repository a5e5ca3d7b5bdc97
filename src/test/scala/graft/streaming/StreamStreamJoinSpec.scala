package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream–stream join: time-bounded matching, watermark-driven state
  * eviction, and deterministic left-outer null emission. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(3600_000L * 24 + min * 60_000L)

  private def run(joinType: String,
      pickups: Seq[(String, String, Timestamp, Int)],
      dropoffs: Seq[(String, Timestamp, Double)],
      lateBatch: Option[(Seq[(String, String, Timestamp, Int)], Seq[(String, Timestamp, Double)])] = None) = {
    implicit val sql = spark.sqlContext
    val pm = MemoryStream[(String, String, Timestamp, Int)]
    val dm = MemoryStream[(String, Timestamp, Double)]
    val joined = StreamStreamJoin.completedTrips(
      pm.toDF.toDF("taxi_id", "trip_id", "pickup_ts", "pickup_area"),
      dm.toDF.toDF("d_trip_id", "dropoff_ts", "trip_total"),
      maxDuration = "4 hours", watermark = "10 minutes", joinType = joinType)
    val name = s"ssj_${joinType}_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      pm.addData(pickups: _*); dm.addData(dropoffs: _*)
      q.processAllAvailable()
      lateBatch.foreach { case (lp, ld) =>
        // a much-later event on each side advances both watermarks so
        // closed pickup windows resolve (outer nulls / state eviction)
        pm.addData(lp: _*); dm.addData(ld: _*)
        q.processAllAvailable()
      }
      (spark.table(name).collect(), q.lastProgress)
    } finally q.stop()
  }

  test("inner: dropoffs join only inside [pickup, pickup+4h]") {
    val (rows, _) = run("inner",
      pickups = Seq(
        ("taxiA", "t1", ts(0), 8),   // matched 30 min later
        ("taxiB", "t2", ts(0), 24),  // "dropoff" 5 h later — out of bound
        ("taxiC", "t3", ts(10), 32)),// no dropoff at all
      dropoffs = Seq(
        ("t1", ts(30), 12.5),
        ("t2", ts(300), 99.0)))
    assert(rows.map(_.getAs[String]("trip_id")).toSeq == Seq("t1"))
    val r = rows.head
    assert(r.getAs[Long]("duration_sec") == 1800L)
    assert(r.getAs[Double]("trip_total") == 12.5)
    assert(r.getAs[Int]("pickup_area") == 8)
  }

  test("leftOuter: abandoned pickup emits nulls once the watermark closes its window") {
    val (rows, progress) = run("leftOuter",
      pickups = Seq(("taxiA", "t1", ts(0), 8), ("taxiC", "t3", ts(10), 32)),
      dropoffs = Seq(("t1", ts(30), 12.5)),
      // beyond t3's pickup + 4 h bound + 10 min watermark on both sides
      lateBatch = Some((
        Seq(("taxiZ", "t9", ts(600), 1)),
        Seq(("t9x", ts(600), 0.0)))))
    val byTrip = rows.map(r => r.getAs[String]("trip_id") -> r).toMap
    assert(byTrip("t1").getAs[Double]("trip_total") == 12.5)
    assert(byTrip.contains("t3"), s"expected the abandoned pickup, got ${byTrip.keys}")
    assert(byTrip("t3").isNullAt(byTrip("t3").fieldIndex("dropoff_ts")))
    assert(byTrip("t3").isNullAt(byTrip("t3").fieldIndex("trip_total")))
    // watermark-evicted state: far fewer state rows than a forever-buffer
    val state = progress.stateOperators
    assert(state.nonEmpty)
    info(s"state rows after watermark advance: ${state.map(_.numRowsTotal).sum}")
  }
}
