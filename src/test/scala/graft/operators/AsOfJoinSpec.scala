package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("leftAsOf matches the newest dim row at-or-before each fact ts") {
    val fact = Seq((1L, 1L, ts(10)), (2L, 1L, ts(25)), (3L, 2L, ts(5)))
      .toDF("fid", "k", "ts")
    val dim = Seq((1L, ts(10), 100L, 1.0), (1L, ts(20), 101L, 2.0))
      .toDF("k", "ts", "did", "v")
    val got = AsOfJoin.leftAsOf(fact, dim, "k", "ts", "did")
      .select($"fid", $"asof.did", $"asof.v")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got === Set(
      (1L, Some(100L), Some(1.0)), // inclusive: ts(10) dim matches ts(10) fact
      (2L, Some(101L), Some(2.0)), // newest preceding wins
      (3L, None, None)))           // no dim at-or-before → null struct
  }

  test("newest dim row with a NULL field wins AS A UNIT (no torn rows)") {
    // the ADVICE r3 scenario: the most recent dim row has v = null.
    // Per-column last(..., ignoreNulls) would pair did=201 with the
    // OLDER row's v=7.0 — a torn row. The struct formulation must
    // deliver (201, null) together.
    val fact = Seq((1L, 1L, ts(30))).toDF("fid", "k", "ts")
    val dim = Seq(
      (1L, ts(10), 200L, Some(7.0)),
      (1L, ts(20), 201L, None: Option[Double]))
      .toDF("k", "ts", "did", "v")
    val got = AsOfJoin.leftAsOf(fact, dim, "k", "ts", "did")
      .select($"asof.did", $"asof.v")
      .as[(Option[Long], Option[Double])].collect().toSeq
    assert(got === Seq((Some(201L), None)),
      "as-of fields must all come from the newest dim row, " +
        "even when its payload field is null")
  }

  test("same-timestamp dim rows break ties by the largest dimTieBreak") {
    val fact = Seq((1L, 1L, ts(20))).toDF("fid", "k", "ts")
    val dim = Seq((1L, ts(20), 300L, 1.0), (1L, ts(20), 301L, 2.0))
      .toDF("k", "ts", "did", "v")
    val got = AsOfJoin.leftAsOf(fact, dim, "k", "ts", "did")
      .select($"asof.did").as[Long].collect().toSeq
    assert(got === Seq(301L))
  }

  test("fact columns colliding with reserved names fail at plan time, not downstream") {
    val dim = Seq((1L, ts(10), 1.0)).toDF("k", "ts", "v")
    for (bad <- Seq("asof", "__fact")) {
      val fact = Seq((1L, 1L, ts(20))).toDF(bad, "k", "ts")
      val e = intercept[IllegalArgumentException] {
        AsOfJoin.leftAsOf(fact, dim, "k", "ts", "v")
      }
      assert(e.getMessage.contains(bad),
        s"error must name the colliding column '$bad'")
    }
  }
}
