package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream–stream join (SURVEY.md §2.7 "beyond": T-family
  * completion) — correlate two live event streams with bounded state.
  * The reference's streaming job only ever joins the trip stream to a
  * STATIC dimension (`StreamingTaxiTrips.py:140-141`); the missing
  * primitive for an event pipeline is joining two UNBOUNDED streams:
  * here pickup events with their matching dropoff events.
  *
  * The 100-TB shape is entirely about state eviction. An unconstrained
  * stream-stream join buffers both streams forever; with (a) a
  * watermark on BOTH event-time columns and (b) a time-range predicate
  * tying the two times together (`dropoff ∈ [pickup, pickup + max]`),
  * Spark derives a state-retention bound per side — a pickup can be
  * dropped from state once the dropoff watermark passes
  * `pickup_ts + maxDuration`, a dropoff once the pickup watermark
  * passes its `dropoff_ts` — so state is O(events per
  * watermark+bound horizon), not O(stream). The join itself shuffles
  * both sides on `trip_id` into the same state store partitions —
  * standard hash co-location, same as the batch SMJ.
  *
  * Left-outer is the abandoned-trip detector: a pickup whose dropoff
  * never arrives is emitted with nulls exactly when the watermark
  * proves no matching dropoff can still come — deterministic
  * completeness, not a timeout guess.
  */
object StreamStreamJoin {

  /** Join pickups (taxi_id, trip_id, pickup_ts, pickup_area) with
    * dropoffs (d_trip_id, dropoff_ts, trip_total).
    *
    * @param joinType "inner" (completed trips) or "leftOuter"
    *                 (+ abandoned pickups with null dropoff columns,
    *                 emitted once the watermark closes their window)
    */
  def completedTrips(pickups: DataFrame, dropoffs: DataFrame,
      maxDuration: String = "4 hours", watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val p = pickups.withWatermark("pickup_ts", watermark)
    val d = dropoffs.withWatermark("dropoff_ts", watermark)
    p.join(d,
        p("trip_id") === d("d_trip_id") &&
          d("dropoff_ts") >= p("pickup_ts") &&
          d("dropoff_ts") <= p("pickup_ts") + expr(s"INTERVAL $maxDuration"),
        joinType)
      .select(
        p("taxi_id"), p("trip_id"), p("pickup_ts"), p("pickup_area"),
        d("dropoff_ts"),
        (unix_timestamp(d("dropoff_ts")) - unix_timestamp(p("pickup_ts")))
          .as("duration_sec"),
        d("trip_total"))
  }
}
