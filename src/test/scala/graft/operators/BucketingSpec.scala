package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing — the pre-shuffle co-location technique for repeated
  * large–large joins (SURVEY.md §4 / the 100-TB playbook): both sides
  * written with `bucketBy(n, key)` hash-place their rows identically,
  * so the join needs NO Exchange at read time. At cluster scale this
  * converts every nightly fact–fact join from a full shuffle into a
  * local zip of bucket files. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables(spark, sf, "orders")
      .write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.format("parquet")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      val n = joined.groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .agg(sum($"n")).head().getLong(0)
      assert(n === Tables(spark, sf, "orders").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
