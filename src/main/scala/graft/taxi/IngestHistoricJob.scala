package graft.taxi

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch ingest: raw trips CSV → cleaned, partitioned Parquet
  * (S1 → P1 → S6; reference `IngestHistoricTrips.py:66-102`).
  *
  * Scale notes:
  *  - narrow pipeline, zero shuffles — one task per CSV split straight
  *    into the partitioned write;
  *  - the write is `partitionBy(year, month)` only (the reference
  *    dropped `day` after hitting the S3 small-files problem — TFM
  *    slides "Problemas/Soluciones"; we keep that layout);
  *  - DROPMALFORMED at the scan: malformed rows never leave the
  *    reader, so there is no separate validation pass.
  */
object IngestHistoricJob {

  /** S1 — raw trips CSV scan: header, explicit schema, 12-hour
    * timestamp format, DROPMALFORMED. */
  def readRawTrips(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("timestampFormat", Schemas.TripTimestampFormat)
      .option("mode", "DROPMALFORMED")
      .schema(Schemas.rawTrips)
      .csv(path)

  /** S6 — partitioned Parquet append. */
  def writeTrips(cleaned: DataFrame, outPath: String): Unit =
    cleaned.write
      .mode("append")
      .partitionBy("year", "month")
      .parquet(outPath)

  /** Full job: scan → clean → partitioned write. */
  def run(spark: SparkSession, inPath: String, outPath: String): Unit =
    writeTrips(Cleaning.clean(readRawTrips(spark, inPath)), outPath)
}
