package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The steering contract (r12 verdict #1: advice must DRIVE a plan):
  * advisedJoin dispatches on the persisted statistics and the PLAN
  * differs by fixture shape — zipfian fact → hot-key salted join at
  * the estimator-chosen exchange width; uniform fact → plain shuffle,
  * no salt; within-budget dim → broadcast. broadcastIfSmall licenses
  * a hint off the Selinger estimate of a FILTERED intermediate and
  * fails closed without stats. All branches result-invisible. */
class SteeringSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String): Unit = {
    // zipfian fact: hot key 7 owns 3000 rows; uniform tail over 30 keys
    val zrows = (1L to 3000L).map(i => (i % 30 + 100L, i, (i % 11).toDouble)) ++
      (1L to 3000L).map(i => (7L, 100000L + i, 1.0))
    zrows.toDF("k", "sid", "v")
      .write.mode("overwrite").parquet(s"$dir/zfact.parquet")
    // uniform fact: same volume, no hot key
    (1L to 6000L).map(i => (i % 130 + 1L, i, (i % 11).toDouble))
      .toDF("k", "sid", "v")
      .write.mode("overwrite").parquet(s"$dir/ufact.parquet")
    (1L to 150L).map(i => (i, s"d$i")).toDF("k", "dname")
      .write.mode("overwrite").parquet(s"$dir/dim.parquet")
  }

  test("the dispatch differs by fixture shape: salted, plain, broadcast") {
    withIndexRoot("graft-steer") {
      val dir = tmpDir("graft-steer-data")
      writeFixture(dir)
      Seq("zfact", "ufact", "dim").foreach(StatsCatalog.ensure(spark, dir, _))
      StatsCatalog.ensureKeyProfile(spark, dir, "zfact", "k", hotFreq = 1000L)
      StatsCatalog.ensureKeyProfile(spark, dir, "ufact", "k", hotFreq = 1000L)

      // zipfian + over-budget dim -> hot-key salted at estimated width
      val (salted, dz) = Steering.advisedJoin(spark, dir, "zfact", "dim",
        "k", $"sid", factor = 4, broadcastBytes = 0L, skewAvgFreq = 64.0,
        targetRowsPerPartition = 512L)
      dz.advice match {
        case StatsCatalog.SaltedShuffle(f) => assert(f === 3000.0)
        case other => fail(s"zipfian fixture must salt, got $other")
      }
      assert(dz.hotKeys === Seq("7"))
      // estimate: |F|·|D|/max(ndv) = 6000·150/150 = 6000 -> 12 parts
      assert(dz.partitions === Some(12))
      val sp = salted.queryExecution.executedPlan.toString
      assert(sp.contains("__salt"), "salted plan must carry the salt key")
      assert(sp.contains(", 12)"),
        s"the exchange must be the estimator's 12 partitions:\n$sp")

      // uniform + over-budget dim -> plain shuffle, NO salt, same width
      val (plain, du) = Steering.advisedJoin(spark, dir, "ufact", "dim",
        "k", $"sid", factor = 4, broadcastBytes = 0L, skewAvgFreq = 64.0,
        targetRowsPerPartition = 512L)
      assert(du.advice === StatsCatalog.PlainShuffle)
      val pp = plain.queryExecution.executedPlan.toString
      assert(!pp.contains("__salt"), "uniform fixture must not pay the salt")
      // estimate: 6000·150/150 = 6000 -> 12 partitions here too
      assert(du.partitions === Some(12) && pp.contains(", 12)"))

      // within-budget dim -> broadcast, no exchange sizing needed
      val (bcast, db) = Steering.advisedJoin(spark, dir, "zfact", "dim",
        "k", $"sid", factor = 4)
      db.advice match {
        case StatsCatalog.BroadcastSide(t, _) => assert(t === "dim")
        case other => fail(s"a small dim must broadcast, got $other")
      }
      assert(bcast.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))

      // every branch is result-invisible vs the plain join
      val truth = graft.Tables(spark, dir, "zfact")
        .join(graft.Tables(spark, dir, "dim"), Seq("k"))
        .groupBy($"dname").agg(sum($"v")).collect().map(_.toString).toSet
      assert(salted.groupBy($"dname").agg(sum($"v"))
        .collect().map(_.toString).toSet === truth)
      assert(bcast.groupBy($"dname").agg(sum($"v"))
        .collect().map(_.toString).toSet === truth)
    }
  }

  test("the registered queries' fixtures drive the intended branches") {
    withIndexRoot("graft-steer-q69") {
      // q69: the zipfian replica must take the SALTED branch — the
      // oracle gate alone can't see which plan ran (salting is
      // result-invisible by design), so the plan is pinned here
      val q69 = graft.queries.RelationalQueries.q69AdvisedSkewJoin
        .fn(spark, "/root/testdata/sf0.001")
      val p69 = q69.queryExecution.executedPlan.toString
      assert(p69.contains("__salt"),
        s"q69's fixture must salt the hot key:\n$p69")
      assert(q69.count() >= 1)
      // q70: the filtered-orders estimate must license the broadcast
      val q70 = graft.queries.RelationalQueries.q70EstimatedBroadcast
        .fn(spark, "/root/testdata/sf0.001")
      assert(q70.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "q70's estimate must license the broadcast hint")
      // q84: the maintained-tier fixture must ALSO salt — the whole
      // dispatch (diagnosis, salt set, exchange width) runs on
      // O(batch)-maintained artifacts, no exact profile anywhere
      val q84 = graft.queries.RelationalQueries.q84MaintainedAdvice
        .fn(spark, "/root/testdata/sf0.001")
      val p84 = q84.queryExecution.executedPlan.toString
      assert(p84.contains("__salt"),
        s"q84's maintained advice must salt the hot key:\n$p84")
      assert(q84.count() >= 1)
    }
  }

  test("broadcastIfSmall licenses the hint by estimate and fails closed") {
    withIndexRoot("graft-steer-bcast") {
      val dir = tmpDir("graft-steer-bcast-data")
      writeFixture(dir)
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val fact = graft.Tables(spark, dir, "zfact")
        def filteredDim() = graft.Tables(spark, dir, "dim")
          .where($"k" <= 20L)
        // no ANALYZE stats yet: fail closed — no hint, planner keeps
        // the veto (threshold -1 -> sort-merge)
        val (cold, hintedCold) = Steering.broadcastIfSmall(
          spark, filteredDim(), maxRows = 50L)
        assert(!hintedCold)
        val coldPlan = fact.join(cold, Seq("k"))
          .queryExecution.executedPlan.toString
        assert(!coldPlan.contains("BroadcastHashJoin"),
          "without stats the planner's own size check must decide")
        // with stats: estimate = 150 × (20/150) = 20 ≤ 50 -> hinted
        StatsCatalog.ensure(spark, dir, "dim")
        val (hot, hintedHot) = Steering.broadcastIfSmall(
          spark, filteredDim(), maxRows = 50L)
        assert(hintedHot)
        val hotJoin = fact.join(hot, Seq("k"))
        assert(hotJoin.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "the estimate must license the broadcast file sizing cannot")
        // over-budget estimate: hint refused
        val (big, hintedBig) = Steering.broadcastIfSmall(
          spark, filteredDim(), maxRows = 10L)
        assert(!hintedBig)
        // and the hinted plan is result-invisible
        assert(hotJoin.groupBy($"dname").count()
          .collect().map(_.toString).toSet ===
          fact.join(filteredDim(), Seq("k")).groupBy($"dname").count()
            .collect().map(_.toString).toSet)
        assert(!hintedBig && big != null)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }

  test("admission control refuses over-budget plans and admits the uncostable") {
    withIndexRoot("graft-steer-admit") {
      val dir = tmpDir("graft-steer-admit-data")
      (1L to 5000L).map(i => (i % 50, i)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$dir/fact.parquet")
      val f = graft.Tables(spark, dir, "fact")
      // un-ANALYZEd: fail-open, admitted with no estimate — a governor
      // must never be wrong about WHY it refused
      assert(Steering.assertAdmissible(spark, f, maxRows = 1L).isEmpty)
      StatsCatalog.ensure(spark, dir, "fact")
      // within budget: admitted, estimate returned as evidence
      assert(Steering.assertAdmissible(spark, f, maxRows = 10000L)
        .contains(BigInt(5000)))
      // a shape outside the algebra (cross join) is admitted fail-open
      assert(Steering.assertAdmissible(spark,
        f.crossJoin(f.select($"k".as("k2"))), maxRows = 1L).isEmpty)
      // over budget: refused BEFORE execution, with the evidence —
      // the 100x self-join fan-out IS estimated (5000^2 / ndv 50)
      val fanout = f.join(f.select($"k".as("k2"), $"v".as("v2")),
        $"k" === $"k2")
      val e2 = intercept[IllegalArgumentException] {
        Steering.assertAdmissible(spark, fanout, maxRows = 10000L)
      }
      assert(e2.getMessage.contains("admission control") &&
        e2.getMessage.contains("500000"),
        s"refusal carries the estimate: ${e2.getMessage}")
    }
  }

  test("the stats advisor reports exactly the artifacts the workload lacks") {
    withIndexRoot("graft-steer-advise") {
      val dir = tmpDir("graft-steer-advise-data")
      (1L to 400L).map(i => (i % 10, s"g${i % 10}", i % 4, i))
        .toDF("k", "name", "seg", "v")
        .write.mode("overwrite").parquet(s"$dir/fct.parquet")
      (0L to 9L).map(i => (i, s"d$i")).toDF("dk", "dn")
        .write.mode("overwrite").parquet(s"$dir/dm.parquet")
      val f = graft.Tables(spark, dir, "fct")
      val d = graft.Tables(spark, dir, "dm")
      val workload = Seq(
        f.groupBy($"k", $"name").agg(count(lit(1))),
        f.join(d, $"k" === $"dk").agg(sum($"v")),
        // equality filter -> the MCV tier wants a list for `name`
        f.where($"name" === "g3").select($"v"),
        // a shape outside the algebra -> one recorded execution fixes it
        f.select($"k", explode(array(lit(1), lit(2))).as("x")))
      def report() = Steering.adviseAnalyze(spark, workload)
      assert(report().map(a => (a.kind, a.table, a.columns)) === Seq(
        ("column_group", "fct", Seq("k", "name")),
        ("key_profile", "dm", Seq("dk")),
        ("key_profile", "fct", Seq("k")),
        ("mcv", "fct", Seq("name")),
        ("table_stats", "dm", Nil),
        ("table_stats", "fct", Nil)), report().toString)
      // run the advised jobs: the report converges — table_stats
      // first, then (once every leaf is ANALYZEd) the feedback gap
      // surfaces for the explode plan, then records away
      def run(as: Seq[Steering.AnalyzeAdvice]): Unit = as.foreach {
        case Steering.AnalyzeAdvice("table_stats", d0, t, _) =>
          StatsCatalog.ensure(spark, d0, t)
        case Steering.AnalyzeAdvice("column_group", d0, t, cols) =>
          StatsCatalog.ensureColumnGroup(spark, d0, t, cols)
        case Steering.AnalyzeAdvice("key_profile", d0, t, Seq(c)) =>
          StatsCatalog.ensureKeyProfile(spark, d0, t, c)
        case Steering.AnalyzeAdvice("mcv", d0, t, Seq(c)) =>
          StatsCatalog.ensureMcv(spark, d0, t, c)
        case Steering.AnalyzeAdvice("feedback", pos, _, _) =>
          val i = pos.stripPrefix("workload[").stripSuffix("]").toInt
          assert(CardFeedback.record(spark, workload(i)).isDefined)
        case other => fail(s"unexpected advice $other")
      }
      run(report())
      val second = report()
      assert(second.map(a => (a.kind, a.dir)) ===
        Seq(("feedback", "workload[3]")),
        s"with every leaf ANALYZEd the uncostable plan surfaces: $second")
      run(second)
      assert(report().isEmpty,
        "after the advised ensures + recording the report must drain")
      workload.foreach { q =>
        assert(graft.plans.CardinalityEstimator.estimateRows(spark, q,
          useFeedback = true).isDefined)
      }
    }
  }
}
