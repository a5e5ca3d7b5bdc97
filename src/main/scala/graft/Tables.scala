package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files per scale-factor directory. At
  * cluster scale these would be directory-partitioned tables; readers
  * here take the table root so Catalyst partition pruning applies when
  * a `year=`-style layout is present (cf. reference
  * `TransformTaxiTrips.py:39-41`, which hand-pruned by path string —
  * we deliberately read the root and let `PruneFileSourcePartitions`
  * do it instead, see SURVEY.md §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver-generated `events` table stores TIMESTAMP(NANOS), which
    // Spark's vectorized Parquet reader rejects (PARQUET_TYPE_ILLEGAL).
    // Read nanos as long and rebuild the timestamp at micro precision
    // (the data is µs-grained, so `DIV 1000` is lossless; integer
    // division — a double division would lose bits above 2^53).
    // `nanosAsLong` is an SQLConf, not a per-read option, so setting it
    // is necessarily session-global; scope the mutation to the one
    // table that needs it (harness session builders also set it at
    // construction — this is the fallback for externally-built
    // sessions).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // rebuild only when the file actually stored NANOS (read as long);
    // derived datasets (e.g. tools.ScaleUp output) store TIMESTAMP
    // directly and must pass through untouched
    val rebuilt =
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      else df
    normalizeNtz(rebuilt)
  }

  /** Driver testdata has also shipped TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ.
    * The engine (and every DuckDB oracle, which reads the same files
    * as naive timestamps) is built against session-UTC TIMESTAMP —
    * under the harness's `spark.sql.session.timeZone=UTC` the cast is
    * wall-clock- and microsecond-value-preserving, so oracle parity is
    * untouched; it only restores the instant-typed column the
    * time-arithmetic operators (`unix_micros`, watermarks) require. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df)((d, c) => d.withColumn(c, d.col(c).cast(TimestampType)))
  }
}
