package graft.taxi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off areas-master (dimension) builder: trips CSV + CommAreas
  * shapefile export → 5-column areas master CSV
  * (P9 → A2 → J3 → S10; reference `AreasLoc.py:48-80`).
  *
  * This is the only job with an isNull/isNotNull filter (F7) and a
  * subsetless `dropDuplicates()` (A2). Output is genuinely small
  * (77 Chicago community areas), so the single-file write is
  * `coalesce(1)` on the ≤77-row FINAL frame only — the upstream
  * dedup/join still run at full parallelism (the reference's
  * `coalesce(1)` sits in the same safe position; at 100 TB input this
  * still holds because coalesce(1) only collapses the tiny result).
  */
object AreasMasterJob {

  /** Area centroids derived from trips: the reference picks rows where
    * company and pickup area are known but the census tract is null
    * (those rows carry area-level centroids — `AreasLoc.py:51-52`),
    * then dedups. */
  def deriveCentroids(trips: DataFrame): DataFrame =
    trips
      .filter(col("company").isNotNull
        && col("pickup_community_area").isNotNull
        && col("pickup_census_tract").isNull)
      .select(
        col("pickup_community_area").as("area_number"),
        col("pickup_centroid_latitude").as("area_centroid_latitude"),
        col("pickup_centroid_longitude").as("area_centroid_longitude"))
      .dropDuplicates()

  /** S3 — CommAreas scan: `;`-separated, headerless, explicit schema. */
  def readCommAreas(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", false)
      .option("sep", ";")
      .option("mode", "DROPMALFORMED")
      .schema(Schemas.commAreasRaw)
      .csv(path)

  /** J3 — inner join on area_number, then the 5-col projection (P8). */
  def build(commAreas: DataFrame, centroids: DataFrame): DataFrame =
    commAreas.join(broadcast(centroids), "area_number")
      .select("area_number", "community", "area_centroid_latitude",
        "area_centroid_longitude", "the_geom")

  /** Full job incl. S10 single-file CSV write. */
  def run(spark: SparkSession, tripsCsvPath: String, commAreasPath: String,
      outPath: String): Unit = {
    val trips = IngestHistoricJob.readRawTrips(spark, tripsCsvPath)
    build(readCommAreas(spark, commAreasPath), deriveCentroids(trips))
      .coalesce(1)
      .write.mode("overwrite")
      .option("header", true)
      .csv(outPath)
  }
}
