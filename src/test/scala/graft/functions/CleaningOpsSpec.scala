package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningOpsSpec extends SparkSpec {
  import spark.implicits._

  test("parseCurrency strips $ , ) and casts to double") {
    val in = Seq("$12.50", "$1,200.00", "$0.00", "(3.25)", "7.1", null)
      .toDF("c")
    val out = in.select(CleaningOps.parseCurrency($"c").as("v"))
      .as[Option[Double]].collect()
    // "(3.25)" keeps the leading paren after the clean → cast fails → null
    assert(out.toSeq === Seq(Some(12.50), Some(1200.00), Some(0.0), None,
      Some(7.1), None))
  }

  test("translate-based parseCurrency == reference regexp_replace form") {
    val in = Seq("$12.50", "$1,200.00", "$0.00", "(3.25)", "7.1", "$1,2,3)",
      "", "$", "abc", null).toDF("c")
    val both = in.select(
      CleaningOps.parseCurrency($"c").as("fast"),
      CleaningOps.parseCurrencyRegex($"c").as("ref"))
    assert(both.where(
      !($"fast" <=> $"ref")).count() === 0)
  }

  test("lossyIntCast truncates toward zero (reference miles semantics)") {
    val out = Seq(0.6, 12.4, -1.7, 3.0).toDF("m")
      .select(CleaningOps.lossyIntCast($"m").as("v")).as[Int].collect()
    assert(out.toSeq === Seq(0, 12, -1, 3))
  }

  test("dayTrunc matches to_timestamp(date_format(ts, 'yyyy-MM-dd 00:00:00'))") {
    val df = Seq("2021-03-05 09:15:30", "2021-12-31 23:59:59")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val both = df.select(
      CleaningOps.dayTrunc($"ts").as("ours"),
      to_timestamp(date_format($"ts", "yyyy-MM-dd 00:00:00")).as("ref"))
    assert(both.where($"ours" =!= $"ref").count() === 0)
  }

  test("year/month derivation") {
    val df = Seq("2021-03-05 09:15:30").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val r = df.select(CleaningOps.yearCol($"ts"), CleaningOps.monthCol($"ts"))
      .as[(Int, Int)].head()
    assert(r === (2021, 3))
  }
}
