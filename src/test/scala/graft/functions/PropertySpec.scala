package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY.md §5.4):
  *  - currency round-trip: any formatted dollar amount survives the
  *    clean + cast path;
  *  - aggregation hierarchy: child-view sums re-aggregate to parent
  *    totals (the A3→A4 invariant for every additive measure — and
  *    the documented NON-invariant for the distinct `taxis` measure);
  *  - sketch properties: Jaccard bounds and MinHash agreement.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling from a ScalaCheck Gen (no scalatestplus
    * bridge in the offline cache — generators only, fixed seeds). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val amounts: Gen[BigDecimal] =
    Gen.chooseNum(0L, 99999999L).map(c => BigDecimal(c) / 100)

  test("property: currency strings round-trip through parseCurrency") {
    samples(Gen.listOfN(50, amounts), 5).foreach { xs =>
      if (xs.nonEmpty) {
        val strs = xs.map(a => f"$$${a}%,.2f") // "$1,234.56"
        val parsed = strs.toDF("c")
          .select(CleaningOps.parseCurrency($"c").as("v"))
          .as[Double].collect()
        assert(parsed.toSeq === xs.map(_.toDouble))
      }
    }
  }

  test("property: additive measures re-aggregate; distinct does not") {
    val keys = Gen.chooseNum(1, 4)
    val rows = Gen.listOfN(200, for {
      company <- Gen.oneOf("A", "B", "C")
      area <- keys
      taxi <- Gen.chooseNum(1, 6)
      fare <- Gen.chooseNum(1, 10000)
    } yield (company, area, s"taxi$taxi", fare.toLong))
    samples(rows, 5).foreach { rs =>
      if (rs.size > 10) {
        val df = rs.toDF("company", "area", "taxi_id", "fare_cents")
        val child = df.groupBy($"company", $"area").agg(
          sum($"fare_cents").as("fares"),
          count(lit(1)).as("trips"),
          countDistinct($"taxi_id").as("taxis"))
        val parentFromChild = child.groupBy($"area").agg(
          sum($"fares").as("fares"), sum($"trips").as("trips"))
        val parentDirect = df.groupBy($"area").agg(
          sum($"fare_cents").as("fares"), count(lit(1)).as("trips"),
          countDistinct($"taxi_id").as("true_taxis"))
        // additive measures agree exactly
        val cmp = parentFromChild.as("c").join(parentDirect.as("d"), "area")
        assert(cmp.where($"c.fares" =!= $"d.fares").count() === 0)
        assert(cmp.where($"c.trips" =!= $"d.trips").count() === 0)
        // the quirk: countDistinct of child taxi-counts is NOT the true
        // distinct unless every company in an area has a unique count
        val quirk = child.groupBy($"area")
          .agg(countDistinct($"taxis").as("quirk_taxis"))
          .join(parentDirect, "area")
        assert(quirk.where($"quirk_taxis" > $"true_taxis").count() === 0,
          "quirk value can never exceed the true distinct count")
      }
    }
  }

  test("property: hash split/sample is invariant to partitioning (no rand())") {
    // the curation split and stratified sample are pure functions of
    // the data — identical results regardless of how rows are
    // partitioned. rand()-based sampling fails this (per-partition
    // RNG streams change with the layout / task retries).
    val q = graft.queries.CurationQueries.all.map(x => x.name -> x.fn).toMap
    for (name <- Seq("c01_corpus_curation", "c02_stratified_sample",
        "c07_corpus_mix", "c09_weighted_sample")) {
      val base = q(name)(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).sorted.toSeq
      // re-run with the session forced to a different shuffle width:
      // the query re-reads and re-partitions from scratch
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val alt = q(name)(spark, "/root/testdata/sf0.001")
          .collect().map(_.toString).sorted.toSeq
        assert(alt === base, s"$name changed under a different partitioning")
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
  }

  test("property: jaccardSorted is bounded and symmetric") {
    val sets = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.distinct.sorted)
    for (a <- samples(sets, 30); b <- samples(sets, 5)) {
      val j1 = HashSketch.jaccardSorted(a, b)
      val j2 = HashSketch.jaccardSorted(b, a)
      assert(j1 === j2)
      assert(j1 >= 0.0 && j1 <= 1.0)
      if (a.nonEmpty) assert(HashSketch.jaccardSorted(a, a) === 1.0)
    }
  }

  test("property: PII redaction is idempotent and marker never re-matches") {
    // random text salted with random PII shapes: redact twice == once
    val word = Gen.oneOf("data", "spark", "a", "x1", "user", "2024")
    val pii = Gen.oneOf(
      "bob@mail.com", "123-45-6789", "555-867-5309", "10.0.0.1", "")
    val doc = for {
      ws <- Gen.listOfN(8, word); p <- pii
    } yield (ws :+ p).mkString(" ")
    samples(Gen.listOfN(40, doc), 5).foreach { texts =>
      val once = texts.toDF("t").select(PiiOps.redact($"t")).as[String].collect()
      val twice = once.toSeq.toDF("t").select(PiiOps.redact($"t")).as[String].collect()
      assert(twice.toSeq === once.toSeq, "redaction must be idempotent")
    }
  }

  test("property: TTR is in (0,1] and qualityWeight in 1..5 for nonempty text") {
    val doc = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dd", "ee"))
      .map(_.mkString(" "))
    samples(Gen.listOfN(50, doc), 5).foreach { texts =>
      val rows = texts.toDF("t")
        .select(TextStats.ttr($"t").as("r"),
          TextStats.qualityWeight($"t").as("w"))
        .as[(Double, Int)].collect()
      rows.foreach { case (r, w) =>
        assert(r > 0.0 && r <= 1.0)
        assert(w >= 1 && w <= 5)
      }
    }
  }
}
