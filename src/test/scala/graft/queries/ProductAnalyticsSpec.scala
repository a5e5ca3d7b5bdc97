package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture semantics for the product-analytics family that the
  * uniformly-active synthetic corpus cannot exercise: staggered
  * cohorts (q56) and duplicate-line-item support grain (q57). */
class ProductAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")

  test("q56: staggered cohorts fill the retention triangle at distinct user-week grain") {
    val dir = tmpDir("graft-retention")
    val rows = Seq(
      // user 1: weeks 0,1,2 — week 0 twice (distinct grain: counts once)
      (1L, ts("2024-01-02")), (1L, ts("2024-01-03")),
      (1L, ts("2024-01-09")), (1L, ts("2024-01-16")),
      // user 2: weeks 0,2 (a gap — week 1 must NOT count)
      (2L, ts("2024-01-02")), (2L, ts("2024-01-16")),
      // user 3: week 1 only (a LATER cohort)
      (3L, ts("2024-01-09")),
      // user 4: weeks 1,2
      (4L, ts("2024-01-09")), (4L, ts("2024-01-16")))
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, t, u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = RelationalQueries.q56CohortRetention.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 2L), (1L, 1L, 1L)),
      s"retention triangle wrong: $got")
  }

  test("q57: duplicate line items never inflate pair support") {
    val dir = tmpDir("graft-basket")
    // order 10 holds parts {1,2} with part 1 listed twice; orders 11
    // and 12 hold {1,2} and {2,3}: support(1,2)=2 despite the dup,
    // support(2,3)=1 (below threshold — absent)
    val li = Seq((10L, 1L), (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L), (12L, 2L), (12L, 3L))
    li.zipWithIndex.map { case ((o, p), i) =>
      (o, p, i.toLong, 1.0, 1.0)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = RelationalQueries.q57FrequentPairs.fn(spark, dir).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L)), s"support grain wrong: $got")
    // nothing skipped at this distribution — full-disclosure column 0
    assert(rows.forall(_.getLong(3) === 0L),
      "no basket should be skipped on a tiny fixture")
  }

  test("q57: one hot basket cannot plan C(n,2) pairs — the budget engages and discloses") {
    val dir = tmpDir("graft-basket-hot")
    // a deliberately hot basket: order 99 holds 600 distinct parts →
    // C(600,2) = 179,700 candidate pairs from ONE key; the per-line
    // budget (256 × 604 lines = 154,624) cannot cover it, so
    // cheapest-first admits the small baskets and skips the hot one,
    // disclosing exactly its mass
    val hot = (1L to 600L).map(p => (99L, 1000L + p))
    val small = Seq((11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L))
    (hot ++ small).zipWithIndex.map { case ((o, p), i) =>
      (o, p, i.toLong, 1.0, 1.0)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = RelationalQueries.q57FrequentPairs.fn(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 2L)),
      s"small baskets must still mine while the hot one is capped: $pairs")
    assert(rows.forall(_.getLong(3) === 179700L),
      s"the skipped hot-basket mass must be disclosed exactly: " +
        s"${rows.map(_.getLong(3)).toSeq}")
  }
}
