package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade receipts for the round-16 family (BENCH_SCALE
  * `round16_family`):
  *
  *  - D106 exact group rollup: the error-0 AQP rung — exact corpus
  *    group-sums vs the rollup serve, SECONDS and task-input BYTES
  *    (the page-cache-immune measurement discipline): the claim is
  *    that the rollup serve's bytes track \|groups\| while the exact
  *    floor's bytes track the corpus across decades;
  *  - D109 generic group histogram: per-group p95 from the bins vs
  *    the exact per-group rank-k sort — same bytes claim, plus the
  *    sort leg's time curve showing what the rung avoids;
  *  - D105 maintained MCV: appendMaintainMcv of a FIXED 10k-row
  *    batch into a table built from this decade's corpus — the
  *    O(batch) claim is a flat-ish curve while the table grows 100×
  *    (the merge reads the batch + a ≤trackK kilobyte frame + two
  *    metadata-speed counts);
  *  - D108 semi-join hash dispatch: the same unskewed LEFT SEMI
  *    join with the rule off (sort-merge) vs on (SHUFFLE_HASH
  *    build-right from stats) — the receipt that dropping both
  *    sides' sorts is a real win, not a hint for its own sake.
  *
  * Methodology: min-of-3 AFTER a warm-up run per serve leg, one JVM
  * per invocation (the r14 lesson: cross-JVM first-vs-third
  * comparisons read backwards); ensure legs are one-time costs,
  * single samples. */
object R16Bench {
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
      java.nio.file.Files.createTempDirectory("r16bench").toString

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

    val SA = graft.operators.SampledAgg
    // one managed fixture table for the AQP legs: (event_id, g, value)
    val fix = SA.ensureToleranceAvgFixture(spark, dir)

    // ---- D106 exact group rollup -------------------------------------
    out("roll_ensure_sec") = timed {
      SA.ensureGroupRollup(spark, fix, "tol_a", "g", "value")
    }
    def sumsLeg(tol: Long): (Double, Long, String) = {
      var src = ""
      val (sec, bytes) = minOf3 {
        val (df, s0) = SA.serveGroupSums(spark, fix, "tol_a", "event_id",
          "g", "value", tol)
        src = s0
        df.collect(); ()
      }
      (sec, bytes, src)
    }
    val (rS, rB, rSrc) = sumsLeg(0L) // rollup serves even tolerance 0
    out("roll_serve_sec") = rS; out("roll_serve_bytes") = rB
    out("roll_serve_src") = rSrc
    SA.dropGroupRollup(fix, "tol_a", "g", "value")
    val (eS, eB, eSrc) = sumsLeg(0L) // no rollup -> exact corpus floor
    out("roll_exact_sec") = eS; out("roll_exact_bytes") = eB
    out("roll_exact_src") = eSrc
    SA.ensureGroupRollup(spark, fix, "tol_a", "g", "value")

    // ---- D109 group histogram quantiles ------------------------------
    out("hist_ensure_sec") = timed {
      SA.ensureGroupHistogram(spark, fix, "tol_a", "g", "value")
    }
    def quantLeg(tol: Long): (Double, Long, String) = {
      var src = ""
      val (sec, bytes) = minOf3 {
        val (df, s0) = SA.serveGroupQuantiles(spark, fix, "tol_a",
          "g", "value", 95, tol)
        src = s0
        df.collect(); ()
      }
      (sec, bytes, src)
    }
    val (hS, hB, hSrc) = quantLeg(100000L)
    out("hist_serve_sec") = hS; out("hist_serve_bytes") = hB
    out("hist_serve_src") = hSrc
    // the exact leg measures the PURE per-group sort (review pass 3:
    // with the artifact present, tolerance-0 still evaluated rung 1's
    // window aggregation before falling through)
    SA.dropAllGroupHistograms(fix, "tol_a")
    val (xS, xB, xSrc) = quantLeg(0L)
    out("hist_exact_sec") = xS; out("hist_exact_bytes") = xB
    out("hist_exact_src") = xSrc
    SA.ensureGroupHistogram(spark, fix, "tol_a", "g", "value")

    // ---- D105 maintained MCV: fixed 10k-row batch --------------------
    val SM = graft.operators.StatsMaintain
    val mfixDir = s"${sys.props("graft.index.dir")}/mcv_bench"
    val ev = graft.Tables(spark, dir, "events").select(
      $"event_id", pmod($"user_id", lit(64L)).as("k"), $"value")
    ev.write.mode("overwrite").parquet(s"$mfixDir/mtab.parquet")
    out("mcv_ensure_sec") = timed {
      SM.ensureMcvMaint(spark, mfixDir, "mtab", "k")
    }
    val smallBatch = ev.limit(10000)
      .withColumn("event_id", $"event_id" + 1000000000L)
      .cache()
    out("mcv_batch_rows") = smallBatch.count()
    smallBatch.write.mode("append").parquet(s"$mfixDir/mtab.parquet")
    out("mcv_maintain_sec") = timed {
      SM.appendMaintainMcv(spark, mfixDir, "mtab", "k", smallBatch)
    }

    // ---- D108 semi-join hash dispatch --------------------------------
    val sfixDir = s"${sys.props("graft.index.dir")}/shj_bench"
    ev.select($"event_id", $"value")
      .write.mode("overwrite").parquet(s"$sfixDir/sfact.parquet")
    ev.select(pmod($"event_id", lit(5000L)).as("event_id")).distinct()
      .write.mode("overwrite").parquet(s"$sfixDir/sdim.parquet")
    val SC = graft.operators.StatsCatalog
    SC.ensure(spark, sfixDir, "sfact")
    SC.ensure(spark, sfixDir, "sdim")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def semiLeg(): Long = {
      val f = graft.Tables(spark, sfixDir, "sfact")
      val d = graft.Tables(spark, sfixDir, "sdim")
      f.join(d, f("event_id") === d("event_id"), "left_semi").count()
    }
    graft.plans.TransparentJoinSteering.disableForTest(spark)
    out("semi_smj_sec") = {
      semiLeg(); (1 to 3).map(_ => timed { semiLeg(); () }).min
    }
    graft.plans.TransparentJoinSteering.enable(spark,
      broadcastBytes = 1024L, skewAvgFreq = 1e9,
      hashBytes = 8L * 1024 * 1024 * 1024)
    out("semi_shj_sec") = {
      semiLeg(); (1 to 3).map(_ => timed { semiLeg(); () }).min
    }
    graft.plans.TransparentJoinSteering.disableForTest(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

    def jsonVal(v: Any): String = v match {
      // Locale.ROOT: a comma-decimal default locale would emit
      // invalid JSON (review pass 3)
      case d: Double =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      case s: String => "\"" + s + "\""
      case x => x.toString
    }
    println(s"""R16BENCH {"label":"$label",${
      out.map { case (k, v) => s""""$k":${jsonVal(v)}""" }.mkString(",")}}""")
    spark.stop()
  }
}
