package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade receipts for the round-15 family (BENCH_SCALE
  * `round15_family`):
  *
  *  - D101 tolerance-declared AQP serving: the exact corpus
  *    group-count vs the declared-tolerance sample serve vs the
  *    stratified escalation, in SECONDS and task-input BYTES
  *    (page-cache-immune — the engine's measurement discipline for
  *    IO claims): at 100 TB the bytes curve is the time curve, and
  *    the claim is that the sample serve's bytes track the SAMPLE,
  *    not the corpus;
  *  - D99 learned transparent ordering: the optimizer DECISION time
  *    of the q90 chain with the MCV tier on (memo bypassed — the
  *    opt-in's stated price) vs tiers off (memoized steady state),
  *    plus the innermost-pair pin proving the flip happened at every
  *    decade — plan-metadata cost, expected flat-ish across decades;
  *  - D96 sub-root harvesting: the per-action cost of
  *    harvestSubtrees on an executed 3-join query — a plan walk plus
  *    ≤16 kilobyte artifact writes, expected flat across decades
  *    (it never touches data).
  *
  * Methodology: min-of-3 AFTER a warm-up run per serve leg, one JVM
  * per invocation (the r14 steering-receipt lesson: cross-JVM
  * first-run-vs-third-run comparisons read backwards); ensure legs
  * are one-time costs and reported as single samples. */
object R15Bench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val label = if (args.length > 1) args(1) else dir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    sys.props("graft.index.dir") =
      java.nio.file.Files.createTempDirectory("r15bench").toString

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def measured(f: => Unit): (Double, Long) = {
      Thread.sleep(300)
      bytesRead.set(0L)
      val s = timed(f)
      Thread.sleep(300)
      (s, bytesRead.get())
    }
    def minOf3(f: => Unit): (Double, Long) = {
      f // warm-up
      (1 to 3).map(_ => measured(f)).minBy(_._1)
    }
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()

    // ---- D101 tolerance serving --------------------------------------
    val SA = graft.operators.SampledAgg
    out("tol_ensure_sec") = timed { SA.ensureToleranceFixture(spark, dir) }
    val fix = SA.ensureToleranceFixture(spark, dir)
    def serveLeg(tol: Long, ppms: Seq[Long], k: Option[Int]): (Double, Long, String) = {
      var src = ""
      val (sec, bytes) = minOf3 {
        val (df, s0) = SA.serveGroupCounts(spark, fix, "tol_t", "event_id",
          "g", tol, ppms, k)
        src = s0
        df.collect()
        ()
      }
      (sec, bytes, src)
    }
    val (exS, exB, exSrc) = serveLeg(0L, Nil, None)
    val (smS, smB, smSrc) = serveLeg(350000L, Seq(250000L), Some(500))
    val (stS, stB, stSrc) = serveLeg(20000L, Seq(250000L), Some(500))
    out("tol_exact_sec") = exS; out("tol_exact_bytes") = exB
    out("tol_exact_src") = exSrc
    out("tol_sample_sec") = smS; out("tol_sample_bytes") = smB
    out("tol_sample_src") = smSrc
    out("tol_strat_sec") = stS; out("tol_strat_bytes") = stB
    out("tol_strat_src") = stSrc

    // ---- D99 learned transparent ordering ----------------------------
    val SC = graft.operators.StatsCatalog
    val ofix = graft.operators.Steering.ensureOrderTierFixture(spark, dir)
    Seq("skew_fact", "ord_b", "ord_c").foreach(SC.ensure(spark, ofix, _))
    SC.ensureMcv(spark, ofix, "skew_fact", "k")
    graft.plans.TransparentJoinOrdering.enable(spark)
    def chain = {
      val a = graft.Tables(spark, ofix, "skew_fact").where($"k" === -1L)
      val b = graft.Tables(spark, ofix, "ord_b")
      val c = graft.Tables(spark, ofix, "ord_c")
      a.join(b, a("event_id") === b("event_id"))
        .join(c, b("b_g") === c("g"))
        .groupBy(pmod(b("b_g"), lit(7L)).as("grp"))
        .agg(count(lit(1)).as("n"))
    }
    def innermost(): String = {
      val joins = chain.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      joins.last.collectLeaves().collect {
        case rel: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          rel.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.head.getName.stripSuffix(".parquet")
          }
      }.sorted.mkString(">")
    }
    spark.conf.unset("spark.graft.ordering.tiers")
    innermost() // warm the stats memos
    out("order_uniform_decide_sec") =
      (1 to 3).map(_ => timed { innermost(); () }).min
    out("order_uniform_innermost") = innermost()
    spark.conf.set("spark.graft.ordering.tiers", "mcv")
    innermost()
    out("order_mcv_decide_sec") =
      (1 to 3).map(_ => timed { innermost(); () }).min
    out("order_mcv_innermost") = innermost()
    spark.conf.unset("spark.graft.ordering.tiers")
    graft.plans.TransparentJoinOrdering.disableForTest(spark)

    // ---- D96 sub-root harvesting -------------------------------------
    Seq("customer", "orders", "lineitem").foreach(SC.ensure(spark, dir, _))
    val cu = graft.Tables(spark, dir, "customer").where($"c_custkey" <= 150L)
    val or = graft.Tables(spark, dir, "orders")
    val li = graft.Tables(spark, dir, "lineitem")
    val threeJoin = cu.join(or, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    threeJoin.collect()
    val CF = graft.operators.CardFeedback
    out("harvest_subtrees_sec") =
      (1 to 3).map(_ => timed {
        CF.harvestSubtrees(spark, threeJoin.queryExecution); ()
      }).min
    out("harvest_subtrees_n") =
      CF.harvestSubtrees(spark, threeJoin.queryExecution)

    // ---- D104 semi-join steering (plain vs salted, the r14 inner
    // receipt's protocol: same JVM, min-of-3 after warm-up per leg) --
    val sfix = graft.operators.Steering.ensureSkewFixture(spark, dir)
    SC.ensure(spark, sfix, "skew_fact"); SC.ensure(spark, sfix, "skew_dim")
    SC.ensureKeyProfile(spark, sfix, "skew_fact", "k", hotFreq = 200L)
    def semiLeg(): Long = {
      val f = graft.Tables(spark, sfix, "skew_fact")
      val d = graft.Tables(spark, sfix, "skew_dim").where($"seg" =!= 3L)
      f.join(d, f("k") === d("k"), "left_semi").count()
    }
    graft.plans.TransparentJoinSteering.disableForTest(spark)
    out("semi_plain_sec") = { semiLeg(); (1 to 3).map(_ => timed { semiLeg(); () }).min }
    graft.plans.TransparentJoinSteering.enable(spark,
      broadcastBytes = 1024L, skewAvgFreq = 64.0, factor = 8)
    out("semi_salted_sec") = { semiLeg(); (1 to 3).map(_ => timed { semiLeg(); () }).min }
    graft.plans.TransparentJoinSteering.disableForTest(spark)

    // ---- D103 maintained ingest: a FIXED 10k-row batch into a table
    // built from this decade's events — the O(batch) claim is a flat
    // curve while the table (and its artifacts) grow 100x -----------
    val MI = graft.streaming.MaintainedIngest
    val ifix = s"${sys.props("graft.index.dir")}/ingest_bench"
    val ev = graft.Tables(spark, dir, "events").select(
      $"event_id", pmod($"user_id", lit(64L)).as("k"), $"value")
    MI.processBatch(ev, 0L, ifix, "ring", profileColumn = Some("k"),
      hotFreq = 100L)
    val smallBatch = ev.where(pmod($"event_id", lit(997L)) === 1L)
      .withColumn("event_id", $"event_id" + 1000000000L)
    out("ingest_batch_rows") = smallBatch.count()
    out("ingest_batch_sec") = timed {
      MI.processBatch(smallBatch, 1L, ifix, "ring",
        profileColumn = Some("k"), hotFreq = 100L)
    }

    def jsonVal(v: Any): String = v match {
      case d: Double => f"$d%.3f"
      case s: String => "\"" + s + "\""
      case x => x.toString
    }
    println(s"""R15BENCH {"label":"$label",${
      out.map { case (k, v) => s""""$k":${jsonVal(v)}""" }.mkString(",")}}""")
    spark.stop()
  }
}
