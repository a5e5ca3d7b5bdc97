package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The maintained-stats contract: exact n/nulls/min/max through
  * appends (typed bound merge, never lexicographic numbers),
  * register max-merge bit-identical to a full rebuild, fail-closed
  * on appended-but-unmaintained data and torn artifacts, and an NDV
  * estimate of advisory quality. */
class StatsMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def base(dir: String): Unit =
    (1L to 900L).map(i => (i, i % 120, s"s${i % 7}", i / 10.0))
      .toDF("id", "k", "tag", "x")
      .write.mode("overwrite").parquet(s"$dir/mt.parquet")

  private def batchRows =
    // ids 2000..2099 extend max; k extends ndv; a value 0.05 drops
    // the double min BELOW 1/10 — the typed-merge tripwire: "0.05" >
    // "0.1" lexicographically, so a string compare would keep 0.1
    (2000L to 2099L).map(i => (i, i % 200, s"s${i % 7}", 0.05))
      .toDF("id", "k", "tag", "x")

  test("exact fields stay exact through an append; registers merge bit-identically") {
    withIndexRoot("graft-maint") {
      val dir = tmpDir("graft-maint-data")
      base(dir)
      StatsMaintain.ensure(spark, dir, "mt")
      val m0 = StatsMaintain.statsIfCurrent(spark, dir, "mt").get
      assert(m0("id").n === 900L && m0("id").min === Some("1") &&
        m0("id").max === Some("900"))
      // append the file FIRST (the contract), then maintain
      batchRows.write.mode("append").parquet(s"$dir/mt.parquet")
      assert(StatsMaintain.statsIfCurrent(spark, dir, "mt").isEmpty,
        "appended-but-unmaintained must fail closed")
      StatsMaintain.appendMaintain(spark, dir, "mt", batchRows)
      val m1 = StatsMaintain.statsIfCurrent(spark, dir, "mt").get
      assert(m1("id").n === 1000L && m1("id").nulls === 0L)
      assert(m1("id").max === Some("2000") || m1("id").max === Some("2099"))
      assert(m1("id").max.get.toLong === 2099L,
        s"typed merge must extend the max: ${m1("id").max}")
      assert(m1("x").min.get.toDouble === 0.05,
        "a lexicographic merge would have kept 0.1 as the double min")
      // register exactness: the maintained registers equal a full
      // rebuild's, row for row (max-merge is exact by algebra)
      val maintained = spark.read
        .parquet(s"${StatsMaintain.maintPath(dir, "mt")}/registers")
        .collect().map(_.toString).sorted.toSeq
      StatsMaintain.reEnsure(spark, dir, "mt")
      val rebuilt = spark.read
        .parquet(s"${StatsMaintain.maintPath(dir, "mt")}/registers")
        .collect().map(_.toString).sorted.toSeq
      assert(maintained === rebuilt,
        "maintenance must never degrade the sketch")
      // NDV estimate is advisory-grade: true ndv(k) = 120 base +
      // 80 new (120..199) = 200; HLL at 512 regs lands well within 2x
      val est = m1("k").ndvEst
      assert(est > 100L && est < 400L, s"ndv(k) estimate off: $est")
    }
  }

  test("the estimator survives an append through the maintained tier") {
    withIndexRoot("graft-maint-est") {
      val dir = tmpDir("graft-maint-est-data")
      base(dir)
      val CE = graft.plans.CardinalityEstimator
      // exact catalog built on the ORIGINAL listing
      StatsCatalog.ensure(spark, dir, "mt")
      StatsMaintain.ensure(spark, dir, "mt")
      def q = graft.Tables(spark, dir, "mt").where($"tag" === "s3")
      assert(CE.estimateRows(spark, q).isDefined)
      // append: the exact catalog's fingerprint path re-keys (stale),
      // and WITHOUT maintenance the estimator would go dark
      batchRows.write.mode("append").parquet(s"$dir/mt.parquet")
      assert(StatsCatalog.statsIfReady(spark, dir, "mt").isEmpty,
        "exact stats are correctly stale after the append")
      assert(CE.estimateRows(spark, q).isEmpty,
        "no current tier -> honest None")
      // O(batch) maintenance restores estimates; 1000 rows / 7 tags
      StatsMaintain.appendMaintain(spark, dir, "mt", batchRows)
      val est = CE.estimateRows(spark, q)
        .getOrElse(fail("maintained tier must serve"))
      assert(est >= BigInt(100) && est <= BigInt(220),
        s"1000/ndv(tag)~7 with HLL error: $est")
    }
  }

  test("join advice survives an append through the maintained tier too") {
    withIndexRoot("graft-maint-advice") {
      val dir = tmpDir("graft-maint-advice-data")
      // every key repeats ~90x: real skew at threshold 50
      (1L to 900L).map(i => (i % 10, i)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$dir/afact.parquet")
      (0L to 9L).map(i => (i, s"d$i")).toDF("k", "dn")
        .write.mode("overwrite").parquet(s"$dir/adim.parquet")
      Seq("afact", "adim").foreach(StatsCatalog.ensure(spark, dir, _))
      StatsMaintain.ensure(spark, dir, "afact")
      StatsMaintain.ensure(spark, dir, "adim")
      def advice = StatsCatalog.adviseJoin(spark, dir, "afact", "adim", "k",
        broadcastBytes = 0L, skewAvgFreq = 50.0)
      assert(advice.isInstanceOf[StatsCatalog.SaltedShuffle])
      // append: exact stats re-key (stale) -> without maintenance the
      // skew signal would vanish
      val batch = (901L to 1000L).map(i => (i % 10, i)).toDF("k", "v")
      batch.write.mode("append").parquet(s"$dir/afact.parquet")
      assert(advice === StatsCatalog.PlainShuffle,
        "stale everything -> no frequency signal, fail-open to plain")
      StatsMaintain.appendMaintain(spark, dir, "afact", batch)
      advice match {
        case StatsCatalog.SaltedShuffle(f) =>
          assert(f > 50.0, s"maintained mean must still flag the skew: $f")
        case other => fail(s"maintained tier must restore the signal: $other")
      }
    }
  }

  test("a batch missing a maintained column advances it as all-NULL") {
    withIndexRoot("graft-maint-miss") {
      val dir = tmpDir("graft-maint-miss-data")
      base(dir)
      StatsMaintain.ensure(spark, dir, "mt")
      // the caller's batch frame lacks tag and x entirely; the file it
      // appended serves NULL for them on every batch row
      val batchMissing = (2000L to 2049L).map(i => (i, i % 200)).toDF("id", "k")
      batchMissing
        .withColumn("tag", lit(null).cast("string"))
        .withColumn("x", lit(null).cast("double"))
        .write.mode("append").parquet(s"$dir/mt.parquet")
      StatsMaintain.appendMaintain(spark, dir, "mt", batchMissing)
      val m = StatsMaintain.statsIfCurrent(spark, dir, "mt").get
      // EVERY column's row count advances by the batch — the r13
      // advice's inconsistency (frozen n for the missing column while
      // siblings advanced) is the tripwire here
      assert(Seq("id", "k", "tag", "x").forall(c => m(c).n === 950L),
        s"per-column n must agree: ${m.view.mapValues(_.n).toMap}")
      assert(m("tag").nulls === 50L && m("x").nulls === 50L)
      assert(m("id").nulls === 0L && m("id").max === Some("2049"))
      // bounds stand: NULLs carry no values
      assert(m("x").min.get.toDouble === 0.1 && m("x").max.get.toDouble === 90.0)
      // and the whole artifact equals a full rebuild over the table
      val maintained = spark.read
        .parquet(s"${StatsMaintain.maintPath(dir, "mt")}/summary")
        .drop("covered").collect().map(_.toString).sorted.toSeq
      StatsMaintain.reEnsure(spark, dir, "mt")
      val rebuilt = spark.read
        .parquet(s"${StatsMaintain.maintPath(dir, "mt")}/summary")
        .drop("covered").collect().map(_.toString).sorted.toSeq
      assert(maintained === rebuilt,
        "all-NULL merge must coincide with a full rebuild")
    }
  }

  test("torn artifacts and stale stamps never serve") {
    withIndexRoot("graft-maint-torn") {
      val dir = tmpDir("graft-maint-torn-data")
      base(dir)
      StatsMaintain.ensure(spark, dir, "mt")
      assert(StatsMaintain.statsIfCurrent(spark, dir, "mt").isDefined)
      // torn summary (no _SUCCESS): fail closed
      val marker = new java.io.File(
        s"${StatsMaintain.maintPath(dir, "mt")}/summary/_SUCCESS")
      assert(marker.delete())
      assert(StatsMaintain.statsIfCurrent(spark, dir, "mt").isEmpty)
      // ensure repairs (full rebuild)
      StatsMaintain.ensure(spark, dir, "mt")
      assert(StatsMaintain.statsIfCurrent(spark, dir, "mt").isDefined)
    }
  }
}
