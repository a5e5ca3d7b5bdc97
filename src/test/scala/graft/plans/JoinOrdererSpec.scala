package graft.plans

import graft.SparkSpec
import graft.operators.StatsCatalog
import org.apache.spark.sql.functions._

/** The join-orderer contract: the chosen order is a function of the
  * STATS (it flips when the selective filter moves to the other end
  * of the chain), the result is order-invisible, estimator-proven
  * small sides get the broadcast hint, and everything fails closed —
  * no stats, or a graph that would need a cartesian, means None. */
class JoinOrdererSpec extends SparkSpec {
  import spark.implicits._

  private val JO = JoinOrderer

  /** chain: dima --ka-- fact --kb-- dimb */
  private def writeTables(dir: String): Unit = {
    (1L to 2000L).map(i => (i % 50 + 1, i % 40 + 1, i))
      .toDF("ka", "kb", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact.parquet")
    (1L to 50L).map(i => (i, s"a$i")).toDF("dak", "aname")
      .write.mode("overwrite").parquet(s"$dir/dima.parquet")
    (1L to 40L).map(i => (i, s"b$i")).toDF("dbk", "bname")
      .write.mode("overwrite").parquet(s"$dir/dimb.parquet")
  }

  private def edges = Seq(
    JO.Edge("dima", "dak", "fact", "ka"),
    JO.Edge("fact", "kb", "dimb", "dbk"))

  test("the chosen order follows the selective filter (stats-dependent plan)") {
    withIndexRoot("graft-jo-flip") {
      val dir = tmpDir("graft-jo-data")
      writeTables(dir)
      Seq("fact", "dima", "dimb").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dima = graft.Tables(spark, dir, "dima")
      val dimb = graft.Tables(spark, dir, "dimb")
      // filter dima selectively: the cheap first pair is {dima, fact}
      val left = JO.choose(spark,
        Seq("fact" -> fact, "dima" -> dima.where($"dak" <= 5L), "dimb" -> dimb),
        edges).getOrElse(fail("must cost"))
      assert(left.order.take(2).toSet === Set("dima", "fact"),
        s"filtered dima joins first, got ${left.order}")
      // move the filter to dimb: the choice must FLIP
      val right = JO.choose(spark,
        Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb.where($"dbk" <= 4L)),
        edges).getOrElse(fail("must cost"))
      assert(right.order.take(2).toSet === Set("fact", "dimb"),
        s"filtered dimb joins first, got ${right.order}")
      // C_out of the chosen chain = est(first pair) + est(full), and
      // the flip is cost-justified: each chosen chain is cheaper than
      // the other fixture's choice would be on THIS fixture
      assert(left.cost > 0 && right.cost > 0)
    }
  }

  test("the reordered result is bit-identical to the declared order") {
    withIndexRoot("graft-jo-eq") {
      val dir = tmpDir("graft-jo-eq-data")
      writeTables(dir)
      Seq("fact", "dima", "dimb").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dima = graft.Tables(spark, dir, "dima").where($"dak" <= 5L)
      val dimb = graft.Tables(spark, dir, "dimb")
      val chosen = JO.choose(spark,
        Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb), edges)
        .getOrElse(fail("must cost"))
      val declared = fact
        .join(dima, dima("dak") === fact("ka"))
        .join(dimb, dimb("dbk") === fact("kb"))
      val got = chosen.df.select($"payload", $"aname", $"bname")
        .collect().map(_.toString).sorted
      val want = declared.select($"payload", $"aname", $"bname")
        .collect().map(_.toString).sorted
      assert(got.sameElements(want), "reordering must be result-invisible")
    }
  }

  test("estimator-proven small sides carry the broadcast hint") {
    withIndexRoot("graft-jo-bc") {
      val dir = tmpDir("graft-jo-bc-data")
      writeTables(dir)
      Seq("fact", "dima", "dimb").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dima = graft.Tables(spark, dir, "dima")
      val dimb = graft.Tables(spark, dir, "dimb")
      // file-size planning disabled: only the estimator's hint can
      // produce a broadcast join here
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val chosen = JO.choose(spark,
          Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb),
          edges, broadcastRows = 100L).getOrElse(fail("must cost"))
        val phys = chosen.df.queryExecution.executedPlan.toString
        assert(phys.contains("BroadcastHashJoin"),
          s"50/40-row dims estimate under the 100-row budget:\n$phys")
        // and with a zero budget no hint survives — fail-closed
        val bare = JO.choose(spark,
          Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb),
          edges, broadcastRows = 0L).getOrElse(fail("must cost"))
        assert(!bare.df.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"), "no estimate under budget, no hint")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  test("fail-closed: missing stats or a disconnected graph answer None") {
    withIndexRoot("graft-jo-none") {
      val dir = tmpDir("graft-jo-none-data")
      writeTables(dir)
      // dimb never ANALYZEd
      Seq("fact", "dima").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dima = graft.Tables(spark, dir, "dima")
      val dimb = graft.Tables(spark, dir, "dimb")
      assert(JO.choose(spark,
        Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb), edges).isEmpty,
        "un-ANALYZEd leaf -> no order")
      // no edge to dimb: ordering it would need a cartesian product
      assert(JO.choose(spark,
        Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb),
        edges.take(1)).isEmpty, "disconnected graph -> None")
    }
  }

  test("beyond MaxRels the greedy fallback orders 12 relations, filtered dim first") {
    withIndexRoot("graft-jo-greedy") {
      val dir = tmpDir("graft-jo-greedy-data")
      // star: fact(k1..k11, payload) joined to 11 dims; d11 filtered
      val keyCols = (1 to 11).map(j => s"k$j")
      (1L to 2000L).map { i =>
        org.apache.spark.sql.Row.fromSeq(
          (1 to 11).map(j => i % (10L * j) + 1) :+ i)
      } match { case rows =>
        val schema = org.apache.spark.sql.types.StructType(
          keyCols.map(c => org.apache.spark.sql.types.StructField(
            c, org.apache.spark.sql.types.LongType)) :+
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.LongType))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows), schema)
          .write.mode("overwrite").parquet(s"$dir/fact.parquet")
      }
      (1 to 11).foreach { j =>
        (1L to (10L * j)).map(i => (i, s"d${j}_$i")).toDF("dk", s"name$j")
          .write.mode("overwrite").parquet(s"$dir/dim$j.parquet")
      }
      (Seq("fact") ++ (1 to 11).map(j => s"dim$j"))
        .foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dims = (1 to 11).map(j => s"dim$j" ->
        (if (j == 11) graft.Tables(spark, dir, "dim11").where($"dk" <= 3L)
         else graft.Tables(spark, dir, s"dim$j")))
      val rels = ("fact" -> fact) +: dims
      val starEdges = (1 to 11).map(j => JO.Edge("fact", s"k$j", s"dim$j", "dk"))
      val chosen = JO.choose(spark, rels, starEdges)
        .getOrElse(fail("greedy must cost a fully-ANALYZEd star"))
      // seed: est(fact ⋈ filtered dim11) ≈ 2000·3/110 is the cheapest
      // pair — the filtered dim attaches FIRST, the point of ordering
      assert(chosen.order.take(2).toSet === Set("fact", "dim11"),
        s"the filtered dim must join first, got ${chosen.order}")
      assert(chosen.order.size === 12 && chosen.cost > 0)
      // result parity vs the declared order on a projection
      val declared = dims.foldLeft(fact) { case (acc, (name, df)) =>
        val j = name.stripPrefix("dim").toInt
        acc.join(df, acc(s"k$j") === df("dk"))
      }
      val got = chosen.df.select($"payload", $"name11")
        .collect().map(_.toString).sorted
      val want = declared.select($"payload", $"name11")
        .collect().map(_.toString).sorted
      assert(got.sameElements(want), "greedy ordering must be result-invisible")
      // the DP's refusals survive at 12 relations: disconnected → None
      assert(JO.choose(spark, rels, starEdges.take(10)).isEmpty,
        "a disconnected 12-relation graph still refuses")
      // and an un-ANALYZEd leaf → None (fail-closed, not a guess)
      val fresh = tmpDir("graft-jo-greedy-cold")
      (1L to 5L).map(i => (i, i)).toDF("dk", "x")
        .write.mode("overwrite").parquet(s"$fresh/dimx.parquet")
      val withCold = rels.init :+ ("dim11" ->
        graft.Tables(spark, fresh, "dimx"))
      assert(JO.choose(spark, withCold, starEdges).isEmpty,
        "an un-ANALYZEd leaf fails the greedy path closed")
    }
  }

  test("a recorded observation flips the chosen order (the learning optimizer)") {
    withIndexRoot("graft-jo-learn") {
      val dir = tmpDir("graft-jo-learn-data")
      writeTables(dir)
      Seq("fact", "dima", "dimb").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      // dima's filter carries a conjunct OUTSIDE the algebra (the
      // arithmetic rewrites the attribute), so the estimator applies
      // the Selinger default 1/3 and UNDERESTIMATES the 30 true rows;
      // dimb's range filter estimates near its true 12
      val dima = graft.Tables(spark, dir, "dima")
        .where($"dak" <= 30L && $"dak" + 0L <= 30L)
      val dimb = graft.Tables(spark, dir, "dimb").where($"dbk" <= 12L)
      val rels = Seq("fact" -> fact, "dima" -> dima, "dimb" -> dimb)
      // under the misestimate, dima looks cheapest and joins first
      val blind = JO.choose(spark, rels, edges).getOrElse(fail("must cost"))
      assert(blind.order.take(2).toSet === Set("dima", "fact"),
        s"the algebra's underestimate picks dima first: ${blind.order}")
      // record ONE execution of the misestimated subtree...
      assert(graft.operators.CardFeedback.record(spark, dima).contains(30L))
      // ...and the DP, fed the observation, flips to dimb-first
      val learned = JO.choose(spark, rels, edges, useFeedback = true)
        .getOrElse(fail("must cost"))
      assert(learned.order.take(2).toSet === Set("dimb", "fact"),
        s"the observed 30 rows must flip the order: ${learned.order}")
      // the declared algebra stays pinned without the flag
      assert(JO.choose(spark, rels, edges).get.order.take(2).toSet ===
        Set("dima", "fact"))
      // and both orders compute the same rows
      assert(learned.df.select($"payload").collect().map(_.toString).sorted
        .sameElements(blind.df.select($"payload").collect().map(_.toString).sorted))
    }
  }

  test("q72's decision on the gate corpus: the fact table joins LAST") {
    withIndexRoot("graft-jo-q72") {
      val sf = "/root/testdata/sf0.001"
      Seq("customer", "orders", "lineitem")
        .foreach(StatsCatalog.ensure(spark, sf, _))
      val cu = graft.Tables(spark, sf, "customer").where($"c_custkey" <= 150L)
      val or = graft.Tables(spark, sf, "orders")
      val li = graft.Tables(spark, sf, "lineitem")
      val chosen = JO.choose(spark,
        Seq("lineitem" -> li, "orders" -> or, "customer" -> cu),
        Seq(JO.Edge("customer", "c_custkey", "orders", "o_custkey"),
          JO.Edge("orders", "o_orderkey", "lineitem", "l_orderkey")))
        .getOrElse(fail("must cost"))
      assert(chosen.order.last === "lineitem",
        s"the corpus-sized fact must join last, got ${chosen.order}")
      assert(chosen.order.take(2).toSet === Set("customer", "orders"))
    }
  }

  test("a self-loop edge is ignored by the greedy path, never seeded (r14 advice)") {
    withIndexRoot("graft-jo-selfloop") {
      val dir = tmpDir("graft-jo-selfloop-data")
      writeTables(dir)
      Seq("fact", "dima").foreach(StatsCatalog.ensure(spark, dir, _))
      val fact = graft.Tables(spark, dir, "fact")
      val dima = graft.Tables(spark, dir, "dima")
      val rels = Seq("fact" -> fact, "dima" -> dima)
      val clean = Seq(JO.Edge("fact", "ka", "dima", "dak"))
      val withLoop = clean :+ JO.Edge("fact", "ka", "fact", "ka")
      // the DP path already dropped self-loops from its adjacency;
      // the public greedy path used to seed rels(i).join(rels(i))
      val got = JO.chooseGreedy(spark, rels, withLoop)
        .getOrElse(fail("the self-loop must be ignored, not fatal"))
      assert(got.order === JO.chooseGreedy(spark, rels, clean).get.order,
        "a self-loop contributes nothing to the decision")
    }
  }
}
