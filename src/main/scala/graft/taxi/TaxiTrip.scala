package graft.taxi

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed view of the canonical cleaned trips schema (SURVEY.md §1.4:
  * `case class TaxiTrip` + `Dataset[TaxiTrip]` encoders for the core
  * ops where compile-time safety helps — job plumbing, tests,
  * consumers). Field names/types mirror `Schemas.cleanedTrips`
  * exactly; `Cleaning.cleanTyped` is the typed entry point. */
case class TaxiTrip(
    trip_id: String,
    taxi_id: String,
    trip_start_timestamp: Timestamp,
    trip_end_timestamp: Timestamp,
    trip_seconds: Option[Int],
    trip_miles: Option[Int],
    pickup_census_tract: Option[String],
    dropoff_census_tract: Option[String],
    pickup_community_area: Option[Int],
    dropoff_community_area: Option[Int],
    fare: Option[Double],
    tips: Option[Double],
    tolls: Option[Double],
    extras: Option[Double],
    trip_total: Option[Double],
    payment_type: Option[String],
    company: Option[String],
    pickup_centroid_latitude: Option[String],
    pickup_centroid_longitude: Option[String],
    pickup_centroid_location: Option[String],
    dropoff_centroid_latitude: Option[String],
    dropoff_centroid_longitude: Option[String],
    dropoff_centroid_location: Option[String],
    year: Option[Int],
    month: Option[Int])

object TaxiTrip {
  /** Typed cleaning: same shared projection, checked encoder. */
  def cleanTyped(raw: DataFrame): Dataset[TaxiTrip] = {
    val df = Cleaning.clean(raw)
    import df.sparkSession.implicits._
    df.as[TaxiTrip]
  }
}
