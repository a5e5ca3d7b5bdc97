package graft.taxi

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CleaningOps

/** The shared trips-cleaning projection — SINGLE source of truth for
  * the batch (P1, `IngestHistoricTrips.py:71-97`) and streaming (P2,
  * `StreamingTaxiTrips.py:94-120`) paths, which the reference
  * duplicates line-for-line. Batch↔stream parity is a theorem here;
  * the ScalaTest parity spec keeps it honest (SURVEY.md §5.6).
  *
  * All built-in expressions → one WholeStageCodegen span, no shuffle.
  */
object Cleaning {

  /** 25-column cleaning projection over a raw trips frame (CSV-read or
    * JSON-parsed; both resolve by name):
    *  - int casts incl. the deliberately LOSSY miles cast (0.6 mi → 0,
    *    `IngestHistoricTrips.py:77` — preserved semantics, documented)
    *  - currency clean `regexp_replace('[\$,)]','')` + cast double
    *  - year/month partition columns derived from event time
    */
  def clean(raw: DataFrame): DataFrame = raw.select(
    col("trip_id"),
    col("taxi_id"),
    col("trip_start_timestamp"),
    col("trip_end_timestamp"),
    col("trip_seconds").try_cast("int").as("trip_seconds"),
    CleaningOps.lossyIntCast(col("trip_miles")).as("trip_miles"),
    col("pickup_census_tract"),
    col("dropoff_census_tract"),
    col("pickup_community_area").try_cast("int").as("pickup_community_area"),
    col("dropoff_community_area").try_cast("int").as("dropoff_community_area"),
    CleaningOps.parseCurrency(col("fare")).as("fare"),
    CleaningOps.parseCurrency(col("tips")).as("tips"),
    CleaningOps.parseCurrency(col("tolls")).as("tolls"),
    CleaningOps.parseCurrency(col("extras")).as("extras"),
    CleaningOps.parseCurrency(col("trip_total")).as("trip_total"),
    col("payment_type"),
    col("company"),
    col("pickup_centroid_latitude"),
    col("pickup_centroid_longitude"),
    col("pickup_centroid_location"),
    col("dropoff_centroid_latitude"),
    col("dropoff_centroid_longitude"),
    col("dropoff_centroid_location"),
    CleaningOps.yearCol(col("trip_start_timestamp")).as("year"),
    CleaningOps.monthCol(col("trip_start_timestamp")).as("month"))

  /** P5/P6 — rename-projections of the areas dimension for pickup /
    * dropoff enrichment (`TransformTaxiTrips.py:77-89`). */
  def pickupAreas(areas: DataFrame): DataFrame = areas.select(
    col("area_number").as("pickup_community_area"),
    col("community").as("pickup_community_area_name"),
    col("area_centroid_latitude").as("pickup_centroid_latitude"),
    col("area_centroid_longitude").as("pickup_centroid_longitude"))

  def dropoffAreas(areas: DataFrame): DataFrame = areas.select(
    col("area_number").as("dropoff_community_area"),
    col("community").as("dropoff_community_area_name"),
    col("area_centroid_latitude").as("dropoff_centroid_latitude"),
    col("area_centroid_longitude").as("dropoff_centroid_longitude"))
}
