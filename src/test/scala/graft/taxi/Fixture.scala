package graft.taxi

/** Synthetic raw-trips fixture in the reference CSV shape (header +
  * `$`-currency + 12-hour timestamps + empty fields), designed to
  * exercise every cleaning/join edge:
  *  - `$1,200.00`-style currency with thousands separator
  *  - lossy miles cast (0.6 → 0; 12.4 → 12)
  *  - empty trip_seconds / census tracts / company
  *  - area 99 (unknown to the areas master) → exercises the
  *    inner-vs-left join split
  *  - one EXACT duplicate row (t1) → exercises `.distinct()`
  *  - rows spanning two months → partitioned write
  * Values are original — nothing copied from the reference's sample.
  */
object Fixture {

  val rawTripsHeader: String =
    "trip_id,taxi_id,trip_start_timestamp,trip_end_timestamp,trip_seconds," +
      "trip_miles,pickup_census_tract,dropoff_census_tract," +
      "pickup_community_area,dropoff_community_area,fare,tips,tolls,extras," +
      "trip_total,payment_type,company,pickup_centroid_latitude," +
      "pickup_centroid_longitude,pickup_centroid_location," +
      "dropoff_centroid_latitude,dropoff_centroid_longitude," +
      "dropoff_centroid_location"

  val rawTripsRows: Seq[String] = Seq(
    // area 10→20, plain fares
    """t1,taxiA,03/05/2021 09:15:00 AM,03/05/2021 09:40:00 AM,1500,3.2,,,10,20,$12.50,$2.00,$0.00,$1.00,$15.50,Credit Card,Acme Cab,41.90,-87.63,POINT (-87.63 41.90),41.95,-87.65,POINT (-87.65 41.95)""",
    // EXACT duplicate of t1 (distinct() must collapse)
    """t1,taxiA,03/05/2021 09:15:00 AM,03/05/2021 09:40:00 AM,1500,3.2,,,10,20,$12.50,$2.00,$0.00,$1.00,$15.50,Credit Card,Acme Cab,41.90,-87.63,POINT (-87.63 41.90),41.95,-87.65,POINT (-87.65 41.95)""",
    // lossy miles 0.6 → 0; thousands separator in fare
    """t2,taxiA,03/05/2021 11:00:00 AM,03/05/2021 11:05:00 AM,300,0.6,,,10,10,"$1,200.00",$0.00,$0.00,$0.00,"$1,200.00",Cash,Acme Cab,41.90,-87.63,POINT (-87.63 41.90),41.90,-87.63,POINT (-87.63 41.90)""",
    // empty trip_seconds + empty company
    """t3,taxiB,03/06/2021 02:30:00 PM,03/06/2021 02:55:00 PM,,5.1,,,20,10,$18.00,$3.50,$0.00,$0.00,$21.50,Credit Card,,41.95,-87.65,POINT (-87.65 41.95),41.90,-87.63,POINT (-87.63 41.90)""",
    // unknown area 99 (not in areas master) — dropped by inner, kept by left
    """t4,taxiB,03/06/2021 08:00:00 PM,03/06/2021 08:20:00 PM,1200,12.4,,,99,10,$25.00,$5.00,$1.50,$0.00,$31.50,Mobile,Beta Taxi,41.80,-87.60,POINT (-87.60 41.80),41.90,-87.63,POINT (-87.63 41.90)""",
    // second month (April) for partitioning; census tract present
    """t5,taxiC,04/01/2021 12:01:00 AM,04/01/2021 12:31:00 AM,1800,7.0,17031081500,17031839100,20,20,$22.25,$0.00,$0.00,$2.00,$24.25,Cash,Beta Taxi,41.95,-87.65,POINT (-87.65 41.95),41.95,-87.65,POINT (-87.65 41.95)""",
    // null areas (no community area at all)
    """t6,taxiC,04/02/2021 06:45:00 PM,04/02/2021 07:00:00 PM,900,2.2,,,,,$9.75,$1.00,$0.00,$0.00,$10.75,Credit Card,Acme Cab,,,,,,""",
    // area 20 pickup with company + null tract → contributes area 20 centroid
    """t7,taxiD,04/03/2021 10:20:00 AM,04/03/2021 10:50:00 AM,1800,4.4,,,20,10,$16.00,$2.50,$0.00,$0.00,$18.50,Credit Card,Beta Taxi,41.95,-87.65,POINT (-87.65 41.95),41.90,-87.63,POINT (-87.63 41.90)""")

  def rawTripsCsv: String = (rawTripsHeader +: rawTripsRows).mkString("\n")

  /** Areas master fixture (areas 10/20 known; 99 deliberately absent). */
  val areasCsv: String = Seq(
    "area_number,community,area_centroid_latitude,area_centroid_longitude,the_geom",
    "10,NORTHSIDE,41.90,-87.63,MULTIPOLYGON (((1 1)))",
    "20,LAKEVIEW,41.95,-87.65,MULTIPOLYGON (((2 2)))").mkString("\n")

  /** CommAreas shapefile-export fixture: `;`-separated, headerless. */
  val commAreasCsv: String = Seq(
    "MULTIPOLYGON (((1 1)));per1;a1;c1;cid1;10;NORTHSIDE;10;sa1;sl1",
    "MULTIPOLYGON (((2 2)));per2;a2;c2;cid2;20;LAKEVIEW;20;sa2;sl2",
    "MULTIPOLYGON (((3 3)));per3;a3;c3;cid3;30;GARFIELD;30;sa3;sl3").mkString("\n")

  /** The same trips as rawTripsRows t1/t4 in the producer's JSON shape
    * (all strings except timestamps; 12-hour format). */
  val kafkaJsonLines: Seq[String] = Seq(
    """{"trip_id":"t1","taxi_id":"taxiA","trip_start_timestamp":"03/05/2021 09:15:00 AM","trip_end_timestamp":"03/05/2021 09:40:00 AM","trip_seconds":"1500","trip_miles":"3.2","pickup_census_tract":null,"dropoff_census_tract":null,"pickup_community_area":"10","dropoff_community_area":"20","fare":"$12.50","tips":"$2.00","tolls":"$0.00","extras":"$1.00","trip_total":"$15.50","payment_type":"Credit Card","company":"Acme Cab","pickup_centroid_latitude":"41.90","pickup_centroid_longitude":"-87.63","pickup_centroid_location":"POINT (-87.63 41.90)","dropoff_centroid_latitude":"41.95","dropoff_centroid_longitude":"-87.65","dropoff_centroid_location":"POINT (-87.65 41.95)"}""",
    """{"trip_id":"t4","taxi_id":"taxiB","trip_start_timestamp":"03/06/2021 08:00:00 PM","trip_end_timestamp":"03/06/2021 08:20:00 PM","trip_seconds":"1200","trip_miles":"12.4","pickup_census_tract":null,"dropoff_census_tract":null,"pickup_community_area":"99","dropoff_community_area":"10","fare":"$25.00","tips":"$5.00","tolls":"$1.50","extras":"$0.00","trip_total":"$31.50","payment_type":"Mobile","company":"Beta Taxi","pickup_centroid_latitude":"41.80","pickup_centroid_longitude":"-87.60","pickup_centroid_location":"POINT (-87.60 41.80)","dropoff_centroid_latitude":"41.90","dropoff_centroid_longitude":"-87.63","dropoff_centroid_location":"POINT (-87.63 41.90)"}""")

  def write(path: String, content: String): String = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, content)
    path
  }
}
