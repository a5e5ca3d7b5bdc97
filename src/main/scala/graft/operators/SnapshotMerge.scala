package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-writer-wins snapshot merge — the CDC/upsert compaction
  * primitive of a crawl pipeline: a standing corpus plus a stream of
  * recrawls and new documents, resolved to "one row per key, the most
  * recent version". The reference's `TransformTaxiTrips.py` rebuilds
  * its views from the FULL history every day; at 100 TB the daily
  * delta is ~0.1% of the corpus and the merge must cost O(corpus
  * shuffle) at worst — and O(touched partitions) with a partitioned
  * base.
  *
  * Shape: `unionByName` (no join — a full-outer join would build hash
  * tables of both sides; union + window needs only one hash shuffle on
  * the key) then `row_number` over (key; version desc, origin desc)
  * keeping rank 1. Origin breaks exact-version ties toward the delta,
  * making the merge deterministic even on replayed deltas — an
  * idempotence requirement, same as StreamingDedup's batch_id
  * discipline.
  *
  * The per-key window is 2–3 rows wide (base row + delta rows for that
  * key), so WindowExec state is trivially bounded; with a
  * date-partitioned base the scale path is [[touchedPartitionValues]]:
  * semi-join the base's partition column against the delta's keys and
  * rewrite only those partitions (delta keys broadcast — the delta is
  * the small side by construction).
  */
object SnapshotMerge {

  /** Merge `delta` into `base`: one row per `key`, highest `version`
    * wins, `delta` wins version ties. Both frames must share a schema
    * (use unionByName-compatible projections). */
  def latestWins(base: DataFrame, delta: DataFrame,
      key: String, version: String): DataFrame = {
    val tagged = base.withColumn("__origin", lit(0))
      .unionByName(delta.withColumn("__origin", lit(1)))
    tagged
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(version).desc, col("__origin").desc)))
      .where(col("__rn") === 1)
      .drop("__rn", "__origin")
  }

  /** The partition values of `base` a merge of `delta` would touch —
    * broadcast semi-join of the (small) delta keyset against the
    * base's (partitionCol, key) projection. Rewriting only these
    * partitions turns the daily merge from O(corpus) into
    * O(delta-adjacent data). */
  def touchedPartitionValues(base: DataFrame, delta: DataFrame,
      key: String, partitionCol: Column): DataFrame =
    base.select(partitionCol.as("__part"), col(key))
      .join(broadcast(delta.select(col(key)).distinct()), Seq(key), "left_semi")
      .select(col("__part")).distinct()
}
