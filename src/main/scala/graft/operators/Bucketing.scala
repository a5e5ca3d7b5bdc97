package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed table layout — persisted co-partitioning, the storage
  * primitive that deletes the shuffle from every subsequent join or
  * aggregation on the bucket key. A fact–fact join (lineitem ⋈ orders)
  * normally shuffles BOTH sides on the key every time it runs; at
  * 100 TB that shuffle dominates the job. Writing each table once with
  * `bucketBy(n, key)` pins rows to `pmod(murmur3(key), n)` files at
  * rest, so Catalyst plans the join as a zero-exchange sort-merge over
  * matching buckets — pay one layout write, then every daily run of
  * the reference's `TransformTaxiTrips.py:93-113` join+agg pipeline
  * reads pre-co-located data. The complement of [[ZOrder]] (which
  * optimizes selective scans; this optimizes repeated joins) and of
  * [[BloomJoin]] (which shrinks a shuffle; this removes it).
  *
  * `repartition(n, key)` before the write uses the SAME murmur3 hash
  * as the bucket assignment, so each task holds exactly one bucket and
  * writes exactly one file — the single-file-per-bucket shape Spark
  * requires to also trust `sortBy` metadata and skip the merge sort.
  */
object Bucketing {

  /** Write `df` as a Spark-native bucketed parquet table (external, at
    * `path`) and return it re-read through the catalog, where the scan
    * reports `outputPartitioning = HashPartitioning(key, buckets)` and
    * joins on `key` need no exchange. Overwrites any prior layout. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String, path: String): DataFrame = {
    val s = df.sparkSession
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
    s.table(table)
  }

  /** Append a batch to an existing bucketed table — the daily-ingest
    * leg of the layout story. Spark validates the (key, buckets) spec
    * against the catalog and hashes the new rows into the SAME bucket
    * files' numbering, so the bucket contract — and therefore the
    * zero-EXCHANGE join — survives any number of appends. What does
    * degrade: each append adds one file per bucket, and with >1 file
    * per bucket Spark no longer trusts `sortBy` metadata, so the merge
    * join re-sorts each bucket locally (a per-partition sort, NOT a
    * shuffle). Periodic compaction — re-running [[writeBucketed]] over
    * the accumulated table — restores the one-file-per-bucket shape;
    * BucketedJoinSpec pins both halves of this contract. */
  def appendBucketed(df: DataFrame, key: String, buckets: Int,
      table: String): DataFrame = {
    val s = df.sparkSession
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("append")
      .saveAsTable(table)
    s.table(table)
  }
}
