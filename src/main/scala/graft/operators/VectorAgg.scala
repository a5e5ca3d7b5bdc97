package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Elementwise vector-mean Aggregator: per-group centroid of an
  * `array<double>` column WITHOUT the posexplode → per-dimension
  * re-aggregate detour. Explode multiplies shuffle volume by the
  * vector dimensionality (64× here) and forces a second aggregate to
  * reassemble arrays; this Aggregator keeps O(dim) state per group,
  * combines map-side (partial sums + count), and shuffles ONE partial
  * vector per group per partition — the right centroid plan at
  * 100 TB.
  *
  * Summation folds partition-local then merges, like any distributive
  * aggregate; callers that need cross-engine determinism round the
  * resulting means (the existing round-8 contract, which already
  * absorbs order effects for Spark's own avg).
  */
object VectorAgg {

  // buffer: (elementwise sums, row count); zero-length marks empty
  type Buf = (Array[Double], Long)

  val meanAggregator: Aggregator[Array[Double], Buf, Array[Double]] =
    new Aggregator[Array[Double], Buf, Array[Double]] {
      override def zero: Buf = (Array.emptyDoubleArray, 0L)

      // ragged inputs are a data bug, not a truncation opportunity:
      // silently folding min(length) yields a wrong centroid with no
      // diagnostic (same fail-loud contract as ConnectedComponents)
      private def requireSameDim(have: Int, got: Int): Unit =
        if (have != got) throw new IllegalArgumentException(
          s"vectorMean requires uniform vector length: buffer dim $have, " +
            s"input dim $got")

      override def reduce(b: Buf, v: Array[Double]): Buf = {
        if (v == null) b
        else if (b._2 == 0L) (v.clone(), 1L)
        else {
          val s = b._1
          requireSameDim(s.length, v.length)
          var i = 0
          while (i < s.length) { s(i) += v(i); i += 1 }
          (s, b._2 + 1)
        }
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a._2 == 0L) b
        else if (b._2 == 0L) a
        else {
          val s = a._1
          requireSameDim(s.length, b._1.length)
          var i = 0
          while (i < s.length) { s(i) += b._1(i); i += 1 }
          (s, a._2 + b._2)
        }
      }

      override def finish(b: Buf): Array[Double] =
        if (b._2 == 0L) Array.emptyDoubleArray
        else b._1.map(_ / b._2)

      override def bufferEncoder: Encoder[Buf] = Encoders.tuple(
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
        Encoders.scalaLong)
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }

  /** Column-level entry: `vectorMean(v)` usable in `df.agg`. */
  def vectorMean(v: Column): Column = udaf(meanAggregator).apply(v)
}
