package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared standing-batch-table contract both streaming legs
  * (StreamingDedup's index, StreamingAnomaly's history) are built on:
  * a parquet table partitioned by `batch_id`, read with an optional
  * strict upper bound for replay idempotence, written with dynamic
  * partition overwrite so a replayed micro-batch rewrites its own
  * partition instead of appending a second copy. One definition —
  * a fix to the FS probe or the overwrite contract applies to every
  * leg at once. */
private[streaming] object BatchTables {

  /** Read the standing table, tolerating not-yet-created dirs (the
    * empty first batch). Probes through the Hadoop FS API, not
    * java.io.File — the table lives on HDFS/object storage in a real
    * deployment, and a local-only probe would silently read every
    * such table as empty. */
  def read(spark: SparkSession, dir: String, schema: StructType,
      beforeBatch: Option[Long]): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hasParquet(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.listStatus(p).exists { st =>
        (st.isFile && st.getPath.getName.endsWith(".parquet")) ||
          (st.isDirectory && hasParquet(st.getPath))
      }
    if (hasParquet(path)) {
      val all = spark.read.parquet(dir)
      val bounded = beforeBatch.fold(all)(b => all.where(col("batch_id") < b))
      bounded.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Write one micro-batch's rows into its `batch_id=<id>` partition
    * under dynamic overwrite (idempotent replay). */
  def writeBatchPartition(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)
}
