package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The iterative-rank contract: the symmetric fixed point is exact,
  * mass flows toward in-degree, results are partitioning-independent,
  * and the loop's physical shape never re-derives the edge input. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphRank.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric pair is a stationary fixed point at exactly 1e6") {
    // contrib = 1e6 DIV 1 = 1e6; rank' = 150000 + 85·1e6 DIV 100 = 1e6
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), 5)
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("a hub outranks its spokes; spokes stay symmetric") {
    // undirected star: hub 0 ↔ spokes 1..4
    val star = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
    val r = ranksOf(star, 3)
    val spokes = (1L to 4L).map(r)
    assert(spokes.distinct.size === 1, "spokes must rank identically")
    assert(r(0L) > spokes.head * 2,
      s"the hub must dominate: ${r(0L)} vs ${spokes.head}")
  }

  test("ranks are partitioning-independent and iteration-deterministic") {
    val edges = (for (i <- 1L to 40L) yield (i, i % 7 + 100L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val once = ranksOf(edges, 3)
    val again = GraphRank.pagerank(
        edges.toDF("src", "dst").repartition(13), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once === again)
  }

  test("a node with no in-edges keeps exactly the teleport mass") {
    // 1 → 2 and 2 ↔ 3: node 1 is a source-only node after step 1
    val r = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 2L)), 2)
    assert(r(1L) === 150000L, s"source-only node must hold teleport: $r")
  }

  test("the result is a materialized rank vector; internal caches are released") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = GraphRank.pagerank(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), 2)
    // pagerank checkpoints the node-cardinality result and RELEASES
    // its edge caches before returning — the returned plan is a
    // single materialized leaf (no re-execution path back to the
    // supersteps), and repeated calls cannot accumulate cache pins:
    // the only persistent RDD the call may leave behind is the
    // checkpoint itself
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.getClass.getSimpleName).toSet
    assert(leaves === Set("InMemoryRelation"),
      s"the rank vector must be served from its cache, got $leaves")
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 1,
      s"only the caller-owned result cache may persist past the call, found $leaked")
  }
}
