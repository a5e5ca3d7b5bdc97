package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (the 100-TB shuffle-join
  * companion to broadcast pruning): when a selective filter sits on
  * the build side of a shuffle join, Catalyst can inject
  * `bloom_filter_agg` on the build side and `BloomFilterMightContain`
  * on the probe side, so most non-matching fact rows are dropped at
  * the scan instead of being shuffled. This spec pins that the engine
  * configuration can produce that plan and that results are
  * unchanged. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter is injected on the probe side of a selective shuffle join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = Tables(spark, sf, "lineitem")
      val ord = Tables(spark, sf, "orders")
        .where($"o_orderpriority" === "1-URGENT")
      val j = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter on the probe side:\n$plan")
      // results identical with the filter disabled
      val withBloom = j.collect().toSeq
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val plain = li.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
          .collect().toSeq
        assert(withBloom === plain)
      }
    }
  }
}
