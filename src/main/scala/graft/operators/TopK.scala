package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-heap per-group top-k (SURVEY.md §7.2 / the q11 scale
  * note): a typed `Aggregator` whose buffer never exceeds k entries,
  * so the per-group state is O(k) on BOTH the map side (partial
  * aggregation trims before the shuffle) and the reduce side — unlike
  * a window over the group, which shuffles every row of the group to
  * one task, or `collect_list`+`slice`, whose partial buffers are
  * unbounded.
  *
  * Entries are (score, tag) pairs ordered by (score desc, tag asc) —
  * the deterministic tie-break used across the engine's top-k
  * surfaces.
  */
object TopK {

  type Entry = (Double, Long) // (score, tie-break tag / id)

  // Explicit comparator rather than Ordering.by(-score): negating the
  // score maps NaN to NaN, whose placement under Scala's tuple
  // ordering diverges from Spark's `desc` semantics.
  // java.lang.Double.compare treats NaN as greater than every value,
  // so score-desc puts NaN rows first — exactly where a
  // `Window.orderBy($"score".desc)` formulation ranks them.
  private def ord: Ordering[Entry] = new Ordering[Entry] {
    def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // score desc
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // tag asc
    }
  }

  /** Merge two ascending-by-rank lists, keep the best k. Both inputs
    * are already ≤ k long, so this is O(k). */
  private def mergeK(a: List[Entry], b: List[Entry], k: Int): List[Entry] = {
    val o = ord
    @annotation.tailrec
    def go(x: List[Entry], y: List[Entry], acc: List[Entry], n: Int): List[Entry] =
      if (n == k) acc.reverse
      else (x, y) match {
        case (Nil, Nil) => acc.reverse
        case (hx :: tx, Nil) => go(tx, Nil, hx :: acc, n + 1)
        case (Nil, hy :: ty) => go(Nil, ty, hy :: acc, n + 1)
        case (hx :: tx, hy :: ty) =>
          if (o.lteq(hx, hy)) go(tx, y, hx :: acc, n + 1)
          else go(x, ty, hy :: acc, n + 1)
      }
    go(a, b, Nil, 0)
  }

  /** The Aggregator: IN = (score, tag), BUF = best-k list (rank
    * order), OUT = best-k list. */
  def topKAggregator(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(buf: List[Entry], e: Entry): List[Entry] =
        mergeK(buf, e :: Nil, k)
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        mergeK(a, b, k)
      override def finish(buf: List[Entry]): Seq[Entry] = buf
      override def bufferEncoder: Encoder[List[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }

  /** DataFrame-level helper: top-k rows per `groupCol` by `scoreCol`
    * (desc), tie-broken by `tagCol` (asc). Output: (group, rnk, tag,
    * score). Implemented over the Aggregator via groupBy +
    * untyped agg; state stays O(k) per group end to end. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      tagCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val agg = udaf(topKAggregator(k))
    df.groupBy(col(groupCol))
      .agg(agg(col(scoreCol).cast("double"), col(tagCol).cast("long")).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("rnk0", "e")))
      .select(col(groupCol), (col("rnk0") + 1).as("rnk"),
        col("e._2").as(tagCol), col("e._1").as(scoreCol))
  }
}
