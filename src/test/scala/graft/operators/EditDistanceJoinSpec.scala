package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The FastSS threshold-1 contract: the deletion-neighborhood
  * blocking is LOSSLESS (pairs ≡ the all-pairs brute force), each
  * edit kind lands on the right side of the threshold, and the plan
  * is an equi-join — never a cartesian. */
class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("blocking is lossless: pairs equal the all-pairs brute force") {
    val cust = graft.Tables(spark, sf, "customer")
    val got = EditDistanceJoin.pairs(cust, "c_custkey", "c_name")
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = cust.select($"c_custkey".as("a_key"), $"c_name".as("anm"))
    val b = cust.select($"c_custkey".as("b_key"), $"c_name".as("bnm"))
    val brute = a.join(b, $"a_key" < $"b_key")
      .where(levenshtein($"anm", $"bnm") <= 1)
      .select($"a_key", $"b_key",
        levenshtein($"anm", $"bnm").cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "the fixture corpus must contain distance-1 pairs")
    assert(got === brute, "deletion-neighborhood candidates must be a " +
      "superset of true pairs and verification must make them exact")
  }

  test("every edit kind resolves correctly at the threshold") {
    val rows = Seq(
      (1L, "abc"),  // identity twin of 2
      (2L, "abc"),  // dist 0
      (3L, "abdc"), // insertion: dist 1 from abc
      (4L, "ab"),   // deletion: dist 1 from abc
      (5L, "axc"),  // substitution: dist 1 from abc
      (6L, "bca"),  // rotation: dist 2 from abc — excluded
      (7L, "xyz"),  // far — excluded
      (8L, "")      // empty: dist 1 from nothing here but must not crash
    ).toDF("id", "s")
    val got = EditDistanceJoin.pairs(rows, "id", "s")
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 1L),
      (1L, 5L, 1L), (2L, 3L, 1L), (2L, 4L, 1L), (2L, 5L, 1L)),
      s"wrong pair set: $got")
  }

  test("single-char strings pair with the empty string and each other") {
    // the empty-string edge the sequence(1,0) guard protects: ""'s
    // only variant is itself, and every 1-char string's deletion IS ""
    val rows = Seq((1L, ""), (2L, "a"), (3L, "b")).toDF("id", "s")
    val got = EditDistanceJoin.pairs(rows, "id", "s")
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("threshold 2: recursive neighborhood is lossless vs all-pairs; threshold 1 misses the 2-typo pairs") {
    val cust = graft.Tables(spark, sf, "customer")
    val got = EditDistanceJoin.pairs(cust, "c_custkey", "c_name", maxDist = 2)
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = cust.select($"c_custkey".as("a_key"), $"c_name".as("anm"))
    val b = cust.select($"c_custkey".as("b_key"), $"c_name".as("bnm"))
    val brute = a.join(b, $"a_key" < $"b_key")
      .where(levenshtein($"anm", $"bnm") <= 2)
      .select($"a_key", $"b_key",
        levenshtein($"anm", $"bnm").cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute,
      "depth-2 deletion neighborhoods must be lossless at threshold 2")
    assert(got.exists(_._3 === 2L),
      "the fixture corpus must contain distance-2 pairs (else this pins nothing)")
    // and they are exactly the pairs threshold 1 cannot see
    val t1 = EditDistanceJoin.pairs(cust, "c_custkey", "c_name")
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t1 === got.filter(_._3 <= 1L),
      "threshold 2 must extend threshold 1, never disturb it")
    // every edit-kind COMPOSITION at the boundary: dist 2 in, dist 3 out
    val rows = Seq((1L, "abcd"), (2L, "axyd"), // 2 substitutions
      (3L, "ab"),     // 2 deletions from abcd
      (4L, "abxcdy"), // 2 insertions into abcd
      (5L, "xbydz")   // dist 3 from abcd — excluded
    ).toDF("id", "s")
    val small = EditDistanceJoin.pairs(rows, "id", "s", maxDist = 2)
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(small.filter(t => t._1 === 1L || t._2 === 1L) ===
      Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L)),
      s"edit-kind compositions at the threshold-2 boundary: $small")
  }

  test("budgeted pairs: a covering budget is exactly pairs() + zero disclosure; a binding one skips hot buckets and discloses") {
    val cust = graft.Tables(spark, sf, "customer")
    val unbudgeted = EditDistanceJoin.pairs(cust, "c_custkey", "c_name", maxDist = 2)
      .select("a_key", "b_key", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val covering = EditDistanceJoin
      .pairsBudgeted(cust, "c_custkey", "c_name", maxDist = 2, Long.MaxValue)
    val covRows = covering.collect()
    assert(covRows.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("dist"))).toSet === unbudgeted,
      "a covering budget must change nothing")
    assert(covRows.forall(_.getAs[Long]("skipped_candidates") === 0L),
      "a covering budget must disclose zero skipped mass")
    // a binding budget: fewer (or equal) pairs, positive disclosure,
    // and every surviving pair is a TRUE pair (subset of unbudgeted —
    // the budget only prunes, never invents)
    val binding = EditDistanceJoin
      .pairsBudgeted(cust, "c_custkey", "c_name", maxDist = 2, 64L * cust.count())
    val bindRows = binding.collect()
    val bindPairs = bindRows.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("dist"))).toSet
    assert(bindPairs.subsetOf(unbudgeted),
      "budgeting must only prune candidates, never invent pairs")
    assert(bindRows.headOption.exists(_.getAs[Long]("skipped_candidates") > 0L),
      "the zero-padded fixture names must make a 64N budget bind " +
        "(else this pins nothing)")
  }

  test("the plan is an equi-join on the variant — never a cartesian") {
    val p = EditDistanceJoin
      .pairs(graft.Tables(spark, sf, "customer"), "c_custkey", "c_name")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join on the variant key:\n$p")
  }
}
