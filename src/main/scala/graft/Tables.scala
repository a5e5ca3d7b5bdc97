package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
