package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Receipt runner for the round-13 family — decade scaling of:
  *
  *  - D85 join ordering: the DP's plan-metadata decision time, the
  *    CHOSEN chain's execution, and the WORST left-deep chain's
  *    execution (fact–fact first) on the same query — the receipt
  *    that ordering pays for itself at scale;
  *  - D86 entity index: one-time ensure (scales with corpus) vs the
  *    point-lookup serve (must stay flat — kilobyte partition reads);
  *  - D87 column groups: the one-pass tuple-NDV ANALYZE (scales) vs
  *    the FD proof read (metadata);
  *  - D88 FD aggregation: the reduced GROUP BY vs the plain one.
  *
  * Usage: runMain graft.tools.R13Bench <sfDir> [label] */
object R13Bench {
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
      java.nio.file.Files.createTempDirectory("r13bench").toString

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val SC = graft.operators.StatsCatalog
    val JO = graft.plans.JoinOrderer

    // ---- D85: join ordering ------------------------------------
    val analyzeSec = timed {
      Seq("customer", "orders", "lineitem", "nation").foreach(SC.ensure(spark, dir, _))
    }
    val cu = graft.Tables(spark, dir, "customer").where($"c_custkey" <= 150L)
    val or = graft.Tables(spark, dir, "orders")
    val li = graft.Tables(spark, dir, "lineitem")
    val edges = Seq(
      JO.Edge("customer", "c_custkey", "orders", "o_custkey"),
      JO.Edge("orders", "o_orderkey", "lineitem", "l_orderkey"))
    var chosen: JO.Chosen = null
    val dpSec = timed {
      chosen = JO.choose(spark,
        Seq("lineitem" -> li, "orders" -> or, "customer" -> cu), edges).get
    }
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("rev"))
    // untimed warm-up: pull the freshly-written replica through the
    // page cache + JIT once, so the timed legs compare PLANS, not
    // which one ran first against cold files
    noop(aggOf(chosen.df))
    val chosenSec = timed(noop(aggOf(chosen.df)))
    // the WORST left-deep chain: the fact-fact pair first, with the
    // broadcast hints Spark's own file-size planning would grant
    // DISABLED so the receipt isolates the ORDER (AQE still on)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val worst = li.join(or, li("l_orderkey") === or("o_orderkey"))
      .join(cu, or("o_custkey") === cu("c_custkey"))
    val worstSec = timed(noop(aggOf(worst)))
    val chosenBareSec = timed(noop(aggOf(
      cu.join(or, cu("c_custkey") === or("o_custkey"))
        .join(li, or("o_orderkey") === li("l_orderkey")))))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    // ---- D86: entity index --------------------------------------
    val EI = graft.operators.EntityIndex
    val ensureSec = timed(EI.ensure(spark, dir))
    val users = Seq(1L, 3L, 7L, 11L, 14L)
    val serveSec = timed(noop(EI.serve(spark, dir, users)._1))
    val rawSec = timed {
      graft.operators.EnsureWatermark.invalidate(EI.indexPath(dir))
      noop(EI.serve(spark, dir, users)._1)
    }
    graft.operators.EnsureWatermark.write(EI.indexPath(dir))

    // ---- D87: column groups -------------------------------------
    val grpSec = timed(
      SC.ensureColumnGroup(spark, dir, "nation", Seq("n_nationkey", "n_name")))
    val fdSec = timed {
      require(SC.determines(spark, dir, "nation", "n_nationkey", "n_name")
        .contains(true))
    }

    // ---- D88: FD aggregation ------------------------------------
    def q75Shape = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_nationkey", $"n_name")
      .agg(count(lit(1)).as("customers"), round(sum($"c_acctbal"), 2).as("bal"))
    val plainAggSec = timed(noop(q75Shape))
    graft.plans.FdAggregation.enable(spark)
    val fdAggSec = timed(noop(q75Shape))
    graft.plans.FdAggregation.disableForTest(spark)

    println(f"""{"metric":"r13_family","label":"$label","sf":"$dir","analyze_4tables_sec":$analyzeSec%.3f,"joinorder_dp_sec":$dpSec%.3f,"joinorder_chosen_sec":$chosenSec%.3f,"joinorder_chosen_bare_sec":$chosenBareSec%.3f,"joinorder_worst_sec":$worstSec%.3f,"chosen_order":"${chosen.order.mkString(">")}","entity_ensure_sec":$ensureSec%.3f,"entity_serve_sec":$serveSec%.3f,"entity_rawscan_sec":$rawSec%.3f,"colgroup_analyze_sec":$grpSec%.3f,"fd_proof_sec":$fdSec%.3f,"agg_plain_sec":$plainAggSec%.3f,"agg_fd_reduced_sec":$fdAggSec%.3f}""")
    spark.stop()
  }
}
