package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter SEMI-JOIN REDUCTION — prune a large join side
  * map-side, BEFORE its shuffle, against a compact sketch of the
  * other side's keys.
  *
  * The scale problem this solves: a selective shuffle join (both
  * sides too big to broadcast, few big-side rows survive) still
  * shuffles the ENTIRE big side — at 100 TB that shuffle IS the
  * query cost. Pruning with a Bloom filter of the other side's keys
  * drops non-joining rows at the scan, shrinking the shuffle to
  * (matching rows + false positives); with the default 1% fpp that
  * is a ~matching-sized shuffle for any meaningfully selective join.
  * False positives are eliminated by the exact join that follows, so
  * composing `prune` with the real join NEVER changes results — the
  * oracle for any query using it is the plain join.
  *
  * Spark-first: the sketch is built by Spark's own
  * `BloomFilterAggregate` (the expression Catalyst's runtime-filter
  * rule injects when it fires) and probed with
  * `BloomFilterMightContain` — both codegen-friendly internals,
  * reached through the graftbridge. A library-level operator is
  * still worth having because the built-in injection is heuristic
  * (creation-side size thresholds, selective-filter detection) and
  * silently declines outside them; this makes the reduction an
  * explicit, deterministic plan choice.
  *
  * The one driver round-trip is the FILTER BYTES (numBits/8 — ~1.2 MB
  * for 10⁶ keys at 1% fpp), not data rows: the same round-trip
  * Spark's injected scalar-subquery filter performs. Keys are hashed
  * with xxhash64 on BOTH sides, so any atomic key type works.
  *
  * Empty or all-null build side ⇒ the aggregate yields a null sketch,
  * `might_contain(null, …)` is null, and the filter drops every row —
  * exactly the inner/semi join result for an empty build side.
  */
object BloomJoin {

  /** Rows of `big` whose `bigKey` PROBABLY appears in `small`'s
    * `smallKey` set (no false negatives; ~fpp false positives — always
    * follow with the exact join).
    *
    * @param expectedItems sizing hint: distinct build-side keys. Pass
    *                      0 (the default) to DERIVE it from the build
    *                      side via `approx_count_distinct` (+10%
    *                      headroom for the sketch's ~5% rsd) — one
    *                      extra pass over the small side, which a
    *                      caller that already knows its cardinality
    *                      skips by passing the hint. A caller-trusted
    *                      fixed default would silently degrade fpp
    *                      (and the "~matching-sized shuffle" claim)
    *                      whenever the build side outgrows it.
    * @param fpp           target false-positive probability */
  def prune(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    require(expectedItems >= 0,
      "expectedItems must be positive, or 0 to derive from the build side")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(64L,
        (small.select(approx_count_distinct(col(smallKey))).head().getLong(0)
          * 1.1).toLong)
    // optimal bits for n items at fpp: -n·ln(p)/ln(2)²
    val numBits = math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      columnToExpr(xxhash64(col(smallKey))),
      Literal(items), Literal(numBits)).toAggregateExpression()
    val sketch = small.select(exprToColumn(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    big.where(exprToColumn(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      columnToExpr(xxhash64(col(bigKey))))))
  }
}
