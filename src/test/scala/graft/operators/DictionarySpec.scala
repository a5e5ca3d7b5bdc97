package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import org.apache.spark.sql.functions._

/** The dictionary contract: codes are the dense 0..NDV-1 value-order
  * ranks whatever the partition count, encoding round-trips, NULLs
  * stay out of the dictionary, and the build plan never runs a
  * global window over the corpus-sized distinct frame. */
class DictionarySpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String): Unit =
    Seq(Some("en"), Some("de"), Some("fr"), Some("en"), None,
      Some("ar"), Some("de"), Some("zh"), Some("en"), None)
      .toDF("w")
      .write.mode("overwrite").parquet(s"$dir/docs.parquet")

  test("codes are dense value-ordered ranks, invariant to partition count") {
    withIndexRoot("graft-dict") {
      val dir = tmpDir("graft-dict-data")
      writeDocs(dir)
      val docs = graft.Tables(spark, dir, "docs")
      val expected = Seq("ar" -> 0L, "de" -> 1L, "en" -> 2L,
        "fr" -> 3L, "zh" -> 4L)
      Seq(1, 3, 8).foreach { parts =>
        val codes = Dictionary.buildCodes(docs, "w", parts)
          .orderBy($"code").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSeq
        assert(codes === expected,
          s"codes must be the global dense rank at parts=$parts")
      }
    }
  }

  test("encode/decode round-trip; NULL and unseen values encode as NULL") {
    withIndexRoot("graft-dict-rt") {
      val dir = tmpDir("graft-dict-rt-data")
      writeDocs(dir)
      Dictionary.ensure(spark, dir, "docs", "w")
      val d = Dictionary.dict(spark, dir, "docs", "w")
      val in = Seq(Some("en"), Some("ar"), None, Some("xx"))
        .toDF("w").withColumn("id", monotonically_increasing_id())
      val enc = Dictionary.encode(in, "w", d, "wc")
      val back = Dictionary.decode(enc, "wc", d, "w")
        .select($"w").collect().map(r => Option(r.getString(0))).toSet
      // en and ar decode back; null and out-of-dictionary map to NULL
      assert(back === Set(Some("en"), Some("ar"), None))
      // order preservation: range predicates work on the codes
      val deCode = d.where($"value" === "de").head().getAs[Long]("code")
      val below = d.where($"code" < deCode).select($"value")
        .collect().map(_.getString(0)).toSet
      assert(below === Set("ar"), "codes below 'de' are exactly values < 'de'")
    }
  }

  test("the build never runs a global window over the distinct values frame") {
    withIndexRoot("graft-dict-plan") {
      val dir = tmpDir("graft-dict-plan-data")
      writeDocs(dir)
      val plan = Dictionary
        .buildCodes(graft.Tables(spark, dir, "docs"), "w", 4)
        .queryExecution.optimizedPlan
      val globals = plan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      // the only global window is the partition-offsets cumsum, whose
      // input is the partition-count-sized aggregate — never raw values
      assert(globals.nonEmpty, "the offsets cumsum window must exist")
      globals.foreach { w =>
        val aggBelow = w.child.collectFirst { case a: Aggregate => a }
        assert(aggBelow.isDefined,
          s"a global window must sit above the partition-count aggregate:\n$w")
      }
      val partitioned = plan.collect {
        case w: Window if w.partitionSpec.nonEmpty => w
      }
      assert(partitioned.nonEmpty,
        "the per-partition rank window must be partitioned (parallel)")
    }
  }
}
