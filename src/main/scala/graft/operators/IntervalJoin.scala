package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval RANGE JOIN via bucket expansion — the operator
  * behind "which window/session/campaign does each event fall in".
  *
  * Spark plans a pure range predicate (`p.ts >= i.start AND
  * p.ts < i.end`) as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * compares, the classic scale killer. This operator makes it an
  * EQUI-join: intervals explode into the fixed-width time buckets
  * they cover, points hash to their single bucket, the join runs on
  * (keys…, bucket) through a normal shuffled/broadcast hash join,
  * and the exact range predicate filters the per-bucket candidates.
  *
  * Correctness: bucketing is a monotone superset cover (a point
  * inside an interval always lands in one of the interval's
  * buckets), and each matched pair meets in EXACTLY one bucket — the
  * point's own — so no post-join dedup is needed.
  *
  * Scale: shuffle volume is |points| + Σ(interval length / width + 1)
  * interval replicas; per-bucket cost is |points-in-bucket| ×
  * |intervals-covering-bucket|. Pick `widthSec` near the typical
  * interval length — wider buckets cut interval fan-out but grow the
  * per-bucket candidate product (a hot time range is a skew key like
  * any other; AQE skew-join or finer widths handle it).
  */
object IntervalJoin {

  /** Inner-join `points` to every interval containing its timestamp:
    * `points.ts ∈ [start, end)` (half-open), optionally also equi on
    * `keys` (present on both sides). Output = point columns then
    * interval columns.
    *
    * @param widthSec bucket width in seconds (≈ typical interval
    *                 length is a good default choice) */
  def pointInInterval(points: DataFrame, ts: String,
      intervals: DataFrame, start: String, end: String,
      widthSec: Long, keys: Seq[String] = Nil): DataFrame = {
    require(widthSec > 0, s"widthSec must be positive, got $widthSec")
    val clash =
      (points.columns.toSet & intervals.columns.toSet) -- keys.toSet
    require(clash.isEmpty,
      s"pointInInterval: columns ${clash.mkString(", ")} exist on both " +
        "sides but are not join keys; rename them first")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "pointInInterval: '__bucket' is reserved")
    // unix_timestamp truncates to seconds — fine for bucketing (a
    // monotone map only needs to keep the point's bucket inside the
    // interval's covered range); the exact predicate below decides
    // membership on the full-precision timestamps
    val p = points.withColumn("__bucket",
      floor(unix_timestamp(col(ts)) / widthSec))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(start)) / widthSec),
        floor(unix_timestamp(col(end)) / widthSec))))
    p.join(i, (keys :+ "__bucket").toIndexedSeq)
      .where(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__bucket")
  }
}
