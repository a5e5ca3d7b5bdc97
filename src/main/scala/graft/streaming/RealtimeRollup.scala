package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Druid-replacement real-time aggregations (SURVEY.md §2.9 D1/D2):
  * the reference delegates its real-time query surface ("active taxis
  * total / by zone / by company, trip volume in recent hours",
  * `README.md:10`) to a Druid rollup datasource
  * (`druid/kafkaIngestionTaxiTrips.json:42-87`). We realize the same
  * capability natively as watermarked windowed streaming aggregates.
  *
  * Scale notes: streaming state is bounded by the watermark (late
  * rows beyond 1 h are dropped from the aggregate); the group key
  * space is window × dims (15-min buckets × ~77 areas × companies) —
  * small state per executor after hash partitioning. The `taxis`
  * distinct measure uses approx_count_distinct (HLL) because exact
  * distinct is unbounded state in append-mode streaming — mirroring
  * the 100-TB `taxis` flag in SURVEY.md §2.4.
  */
object RealtimeRollup {

  /** D1 — 15-minute tumbling rollup of the Druid measure set:
    * count + 7 sums by the 10 Druid dimensions (here the narrow
    * trip dims that exist post-cleaning). */
  def rollup15min(cleaned: DataFrame, watermark: String = "1 hour"): DataFrame =
    cleaned
      .withWatermark("trip_start_timestamp", watermark)
      .groupBy(
        window(col("trip_start_timestamp"), "15 minutes"),
        col("taxi_id"), col("company"),
        col("pickup_community_area"), col("dropoff_community_area"))
      .agg(
        count(lit(1)).as("trips"),
        sum("trip_total").as("triptotal_sum"),
        sum("trip_seconds").as("trip_seconds_sum"),
        sum("trip_miles").as("trip_miles_sum"),
        sum("fare").as("fare_sum"),
        sum("tips").as("tips_sum"),
        sum("tolls").as("tolls_sum"),
        sum("extras").as("extras_sum"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("taxi_id"), col("company"),
        col("pickup_community_area"), col("dropoff_community_area"),
        col("trips"), col("triptotal_sum"), col("trip_seconds_sum"),
        col("trip_miles_sum"), col("fare_sum"), col("tips_sum"),
        col("tolls_sum"), col("extras_sum"))

  /** D2 — "active taxis in the last N hours": sliding window +
    * approximate distinct (bounded HLL state; exact countDistinct is
    * not expressible in append-mode streaming without unbounded
    * state). */
  def activeTaxis(cleaned: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "1 hour"): DataFrame =
    cleaned
      .withWatermark("trip_start_timestamp", watermark)
      .groupBy(window(col("trip_start_timestamp"), windowLen, slide))
      .agg(
        approx_count_distinct("taxi_id").as("active_taxis"),
        count(lit(1)).as("trips"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("active_taxis"), col("trips"))

  /** D2 by zone — the dashboard's "active taxis by zone". */
  def activeTaxisByZone(cleaned: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "1 hour"): DataFrame =
    cleaned
      .withWatermark("trip_start_timestamp", watermark)
      .groupBy(
        window(col("trip_start_timestamp"), windowLen, slide),
        col("pickup_community_area"))
      .agg(
        approx_count_distinct("taxi_id").as("active_taxis"),
        count(lit(1)).as("trips"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("pickup_community_area"), col("active_taxis"), col("trips"))
}
