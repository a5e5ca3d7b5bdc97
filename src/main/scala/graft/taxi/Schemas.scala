package graft.taxi

import org.apache.spark.sql.types._

/** The engine's fixed, explicit schema system (SURVEY.md §1.2) — every
  * read supplies a hand-built StructType; inference is never used.
  *
  * Shapes follow the reference data model:
  *  - raw trips CSV, 23 fields (`IngestHistoricTrips.py:38-62`)
  *  - Kafka JSON payload, 23 fields, strings-first
  *    (`StreamingTaxiTrips.py:49-72`)
  *  - areas master, 5 fields (`StreamingTaxiTrips.py:19-25`)
  *  - raw CommAreas shapefile export, 10 fields, `;`-separated
  *    (`AreasLoc.py:60-71`)
  */
object Schemas {

  /** Uniform timestamp pattern of the raw feeds — 12-hour with AM/PM
    * (`IngestHistoricTrips.py:68`). */
  val TripTimestampFormat = "MM/dd/yyyy hh:mm:ss a"

  /** Raw trips CSV (batch ingest input). Currency fields arrive as
    * `$10.00`-style strings; cleaning casts them later. */
  val rawTrips: StructType = StructType(Seq(
    StructField("trip_id", StringType, nullable = false),
    StructField("taxi_id", StringType, nullable = false),
    StructField("trip_start_timestamp", TimestampType, nullable = false),
    StructField("trip_end_timestamp", TimestampType, nullable = false),
    StructField("trip_seconds", IntegerType),
    StructField("trip_miles", DoubleType),
    StructField("pickup_census_tract", StringType),
    StructField("dropoff_census_tract", StringType),
    StructField("pickup_community_area", IntegerType),
    StructField("dropoff_community_area", IntegerType),
    StructField("fare", StringType),
    StructField("tips", StringType),
    StructField("tolls", StringType),
    StructField("extras", StringType),
    StructField("trip_total", StringType),
    StructField("payment_type", StringType),
    StructField("company", StringType),
    StructField("pickup_centroid_latitude", StringType),
    StructField("pickup_centroid_longitude", StringType),
    StructField("pickup_centroid_location", StringType),
    StructField("dropoff_centroid_latitude", StringType),
    StructField("dropoff_centroid_longitude", StringType),
    StructField("dropoff_centroid_location", StringType)))

  /** Kafka JSON payload — same 23 fields, everything StringType except
    * the two timestamps ("strings first, cast later" idiom). Field
    * order mirrors the producer's JSON; resolution is by name. */
  val kafkaJsonTrips: StructType = StructType(Seq(
    StructField("payment_type", StringType),
    StructField("dropoff_census_tract", StringType),
    StructField("tolls", StringType),
    StructField("trip_total", StringType),
    StructField("dropoff_centroid_latitude", StringType),
    StructField("fare", StringType),
    StructField("tips", StringType),
    StructField("pickup_census_tract", StringType),
    StructField("company", StringType),
    StructField("trip_start_timestamp", TimestampType),
    StructField("trip_miles", StringType),
    StructField("dropoff_community_area", StringType),
    StructField("taxi_id", StringType),
    StructField("trip_id", StringType),
    StructField("pickup_centroid_latitude", StringType),
    StructField("extras", StringType),
    StructField("dropoff_centroid_location", StringType),
    StructField("trip_seconds", StringType),
    StructField("pickup_centroid_location", StringType),
    StructField("trip_end_timestamp", TimestampType),
    StructField("pickup_community_area", StringType),
    StructField("dropoff_centroid_longitude", StringType),
    StructField("pickup_centroid_longitude", StringType)))

  /** Areas master (the 77-row Chicago community-areas dimension). */
  val areas: StructType = StructType(Seq(
    StructField("area_number", IntegerType, nullable = false),
    StructField("community", StringType, nullable = false),
    StructField("area_centroid_latitude", StringType),
    StructField("area_centroid_longitude", StringType),
    StructField("the_geom", StringType)))

  /** Raw CommAreas shapefile export: `;`-separated, headerless. */
  val commAreasRaw: StructType = StructType(Seq(
    StructField("the_geom", StringType),
    StructField("perimeter", StringType),
    StructField("area", StringType),
    StructField("comarea_", StringType),
    StructField("comarea_id", StringType),
    StructField("area_number", IntegerType, nullable = false),
    StructField("community", StringType, nullable = false),
    StructField("area_num_1", IntegerType),
    StructField("shape_area", StringType),
    StructField("shape_len", StringType)))

  /** Canonical cleaned trips schema — output of the shared cleaning
    * projection, stored as Parquet partitioned by (year, month). */
  val cleanedTrips: StructType = StructType(Seq(
    StructField("trip_id", StringType),
    StructField("taxi_id", StringType),
    StructField("trip_start_timestamp", TimestampType),
    StructField("trip_end_timestamp", TimestampType),
    StructField("trip_seconds", IntegerType),
    StructField("trip_miles", IntegerType),
    StructField("pickup_census_tract", StringType),
    StructField("dropoff_census_tract", StringType),
    StructField("pickup_community_area", IntegerType),
    StructField("dropoff_community_area", IntegerType),
    StructField("fare", DoubleType),
    StructField("tips", DoubleType),
    StructField("tolls", DoubleType),
    StructField("extras", DoubleType),
    StructField("trip_total", DoubleType),
    StructField("payment_type", StringType),
    StructField("company", StringType),
    StructField("pickup_centroid_latitude", StringType),
    StructField("pickup_centroid_longitude", StringType),
    StructField("pickup_centroid_location", StringType),
    StructField("dropoff_centroid_latitude", StringType),
    StructField("dropoff_centroid_longitude", StringType),
    StructField("dropoff_centroid_location", StringType),
    StructField("year", IntegerType),
    StructField("month", IntegerType)))
}
