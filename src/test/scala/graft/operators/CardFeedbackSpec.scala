package graft.operators

import graft.SparkSpec
import graft.plans.CardinalityEstimator
import org.apache.spark.sql.functions._

/** The feedback-tier contract (D96): an observed cardinality serves
  * the exact count for its canonical subtree — standalone AND inside
  * a larger plan (the LEO move) — overriding the algebra's
  * correlated-conjunct misestimate; a mutated source re-keys the
  * observation to unreachable (algebra fallback, never yesterday's
  * count); moving plans (current-time expressions) refuse the
  * keyspace; retention only ever costs a re-miss. */
class CardFeedbackSpec extends SparkSpec {
  import spark.implicits._

  test("observed counts override the correlated misestimate, reuse inside joins, and fail closed on mutation") {
    withIndexRoot("graft-feedback") {
      val dir = tmpDir("graft-feedback-data")
      // fact: k uniform over 1..100; dim joins on k
      (1L to 5000L).map(i => (i % 100 + 1, i)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$dir/fact.parquet")
      (1L to 100L).map(i => (i, s"d$i")).toDF("dk", "dname")
        .write.mode("overwrite").parquet(s"$dir/dim.parquet")
      Seq("fact", "dim").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dim = graft.Tables(spark, dir, "dim")

      // correlated conjuncts on one column: the algebra multiplies
      // the two range fractions; the truth is the tighter one alone
      def filtered = dim.where($"dk" <= 50L && $"dk" <= 60L)
      val algebraic = CardinalityEstimator.estimateRows(spark, filtered).get
      assert(algebraic < BigInt(50),
        s"the independence assumption must misestimate here: $algebraic")
      val observed = CardFeedback.record(spark, filtered).get
      assert(observed === 50L)
      assert(CardinalityEstimator.estimateRows(spark, filtered,
        useFeedback = true).contains(BigInt(50)),
        "the observation must serve the exact count")
      // ...and WITHOUT the flag the declared algebra stands
      assert(CardinalityEstimator.estimateRows(spark, filtered)
        .contains(algebraic))

      // the LEO move: the SAME canonical subtree inside a larger
      // plan serves its observation — the join estimate becomes
      // |fact| * observed / max(ndv) instead of riding the miss
      val join = fact.join(filtered, $"k" === $"dk")
      val joinAlg = CardinalityEstimator.estimateRows(spark, join).get
      val joinFb = CardinalityEstimator.estimateRows(spark, join,
        useFeedback = true).get
      assert(joinFb === BigInt(5000) * 50 / 100,
        s"join estimate must consume the subtree observation: $joinFb")
      assert(joinAlg < joinFb, "the algebra alone rode the misestimate")

      // a shape OUTSIDE the algebra becomes estimable when observed
      val exploded = dim.select($"dk", explode(array(lit(1), lit(2))).as("x"))
      assert(CardinalityEstimator.estimateRows(spark, exploded).isEmpty)
      assert(CardFeedback.record(spark, exploded).contains(200L))
      assert(CardinalityEstimator.estimateRows(spark, exploded,
        useFeedback = true).contains(BigInt(200)))

      // mutation re-keys: append to dim -> a FRESH read of the table
      // lists the post-append files, so its stamp cannot reach the
      // observation — the algebra serves again (never a stale count).
      // The HELD frame keeps serving: its cached FileIndex still
      // reads the pre-append files, so 50 is exact FOR THAT PLAN —
      // the r15 plan-own-listing stamp keys observations by what a
      // plan actually scans, not by the live directory
      Seq((101L, "d101")).toDF("dk", "dname")
        .write.mode("append").parquet(s"$dir/dim.parquet")
      val freshFiltered = graft.Tables(spark, dir, "dim")
        .where($"dk" <= 50L && $"dk" <= 60L)
      assert(CardFeedback.observed(spark,
        freshFiltered.queryExecution.analyzed).isEmpty,
        "a fresh post-append read must not reach the old observation")
      assert(CardFeedback.observed(spark,
        filtered.queryExecution.analyzed).contains(50L),
        "the held pre-append frame keeps its exact observation")

      // moving plans refuse the keyspace entirely
      assert(CardFeedback.record(spark,
        dim.where($"dk" <= 50L && current_date().isNotNull)).isEmpty,
        "current-time expressions are never recorded")

      // retention: sweeping to zero only costs a re-miss (the memo
      // may serve a swept observation for the rest of THIS process —
      // still exact, keyed by snapshot; a cold process re-misses)
      assert(CardFeedback.sweep(spark, 0) >= 1)
      CardFeedback.clearMemoForTest()
      assert(CardFeedback.observed(spark,
        exploded.queryExecution.analyzed).isEmpty)
    }
  }

  test("one run of a 3-join query leaves subtree observations the estimator serves standalone (r14 verdict #6)") {
    withIndexRoot("graft-feedback-subtree") {
      val dir = tmpDir("graft-feedback-subtree-data")
      (1L to 5000L).map(i => (i % 100 + 1, i % 40 + 1, i)).toDF("ka", "kb", "v")
        .write.mode("overwrite").parquet(s"$dir/fact.parquet")
      (1L to 100L).map(i => (i, s"a$i")).toDF("dak", "aname")
        .write.mode("overwrite").parquet(s"$dir/dima.parquet")
      (1L to 40L).map(i => (i, s"b$i")).toDF("dbk", "bname")
        .write.mode("overwrite").parquet(s"$dir/dimb.parquet")
      Seq("fact", "dima", "dimb").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dima = graft.Tables(spark, dir, "dima").where($"dak" <= 30L)
      val dimb = graft.Tables(spark, dir, "dimb")
      val query = fact
        .join(dima, $"ka" === $"dak")
        .join(dimb, $"kb" === $"dbk")
        .groupBy($"aname").agg(count(lit(1)).as("n"))
      // the run: ONE explicit harvest of the executed plan (the
      // auto-record listener calls exactly this)
      assert(query.collect().nonEmpty)
      val recorded = CardFeedback.harvestSubtrees(spark, query.queryExecution)
      assert(recorded >= 2, s"filter + join subtrees must harvest, got $recorded")
      // the estimator now serves the EXACT observation for the join
      // subtree, standalone — fished from the plan as the optimizer
      // (and the transparent ordering rule) would see it
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val joins = query.queryExecution.optimizedPlan.collect { case j: Join => j }
      val inner = joins.last // the deepest join: fact ⋈ dima
      val innerDf = org.apache.spark.sql.graftbridge.planToDf(spark, inner)
      val trueRows = innerDf.count()
      assert(trueRows === 1500L)
      assert(graft.plans.CardinalityEstimator.estimateRows(spark, innerDf,
        useFeedback = true).contains(BigInt(1500)),
        "the harvested join-subtree observation must serve standalone")
      // and a LIMITED query never harvests subtrees (partial pulls
      // would record undercounts)
      val lim = fact.join(dima, $"ka" === $"dak").limit(3)
      assert(lim.collect().length === 3)
      assert(CardFeedback.harvestSubtrees(spark, lim.queryExecution) === 0,
        "a Limit anywhere vetoes the whole subtree harvest")
    }
  }

  test("auto-record harvests completed actions transparently; partial and unkeyable ones never record") {
    withIndexRoot("graft-feedback-auto") {
      val dir = tmpDir("graft-feedback-auto-data")
      (1L to 300L).map(i => (i % 10, i)).toDF("g", "v")
        .write.mode("overwrite").parquet(s"$dir/t.parquet")
      val t = graft.Tables(spark, dir, "t")
      CardFeedback.enableAutoRecord(spark)
      try {
        // a plain collect teaches the optimizer with zero client code
        val shape = t.where($"g" <= 3L)
        assert(shape.collect().length === 120)
        def eventually[A](what: String)(f: => Option[A]): A = {
          val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
          var r = f
          while (r.isEmpty && System.nanoTime() < deadline) {
            Thread.sleep(200); r = f
          }
          r.getOrElse(fail(s"$what did not materialize in time"))
        }
        val n = eventually("the harvested observation") {
          CardFeedback.observed(spark, shape.queryExecution.analyzed)
        }
        assert(n === 120L)
        // ...and the estimator's feedback tier consumes it unasked-for
        assert(graft.plans.CardinalityEstimator.estimateRows(spark,
          t.where($"g" <= 3L), useFeedback = true).contains(BigInt(120)))
        // a partially-consumable action never records (an abandoned
        // iterator would teach an undercount)
        val partial = t.where($"g" === 7L)
        val it = partial.toLocalIterator()
        assert(it.hasNext && it.next() != null)
        Thread.sleep(1500)
        assert(CardFeedback.observed(spark,
          partial.queryExecution.analyzed).isEmpty,
          "toLocalIterator must never harvest")
        // moving plans stay unkeyable through the auto path too
        val moving = t.where($"g" <= 3L && current_date().isNotNull)
        assert(moving.collect().length === 120)
        Thread.sleep(1500)
        assert(CardFeedback.observed(spark,
          moving.queryExecution.analyzed).isEmpty)
      } finally CardFeedback.disableAutoRecordForTest(spark)
    }
  }
}
