package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The lineage contract: every derivation kind Catalyst can express
  * maps to the right leaf columns — projections/renames, aggregates
  * (COUNT(*) derives from nothing), joins, generators, unions, and
  * grouping sets — while filter/join PREDICATES never taint (data
  * lineage, not control lineage), and the taint gate catches PII
  * flow through renames and expressions. */
class ColumnLineageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("projection, rename, expression, and aggregate lineage") {
    val od = graft.Tables(spark, sf, "orders")
    val cu = graft.Tables(spark, sf, "customer")
    val df = od.join(cu, $"o_custkey" === $"c_custkey")
      .where($"o_orderstatus" =!= "X" && $"c_acctbal" > -999999)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice" + $"c_acctbal").as("mix"))
    val got = ColumnLineage.sources(df)
    assert(got("c_mktsegment") === Set("customer.parquet.c_mktsegment"))
    assert(got("n") === Set.empty, "COUNT(*) derives from nothing")
    assert(got("mix") === Set("orders.parquet.o_totalprice",
      "customer.parquet.c_acctbal"))
    // the filter's o_orderstatus / c_acctbal predicates gate rows but
    // taint no output column that doesn't otherwise reference them
    assert(!got("c_mktsegment").exists(_.contains("o_orderstatus")))
  }

  test("generators, unions, and grouping sets resolve to their true inputs") {
    val dir = tmpDir("graft-lineage")
    Seq((1L, "a b", "x")).toDF("id", "words", "tag")
      .write.parquet(s"$dir/t.parquet")
    val base = spark.read.parquet(s"$dir/t.parquet")
    val gen = base.select($"id", explode(split($"words", " ")).as("w"))
    val gl = ColumnLineage.sources(gen)
    assert(gl("w") === Set("t.parquet.words"))
    assert(gl("id") === Set("t.parquet.id"))
    val u = base.select($"id".as("k"), $"words".as("v"))
      .unionByName(base.select($"id".as("k"), $"tag".as("v")))
    val ul = ColumnLineage.sources(u)
    assert(ul("v") === Set("t.parquet.words", "t.parquet.tag"),
      "a union column carries every branch's source")
    val roll = base.rollup($"tag").agg(count(lit(1)).as("n"))
    val rl = ColumnLineage.sources(roll)
    assert(rl("tag") === Set("t.parquet.tag"),
      s"grouping-set keys must resolve through Expand: $rl")
  }

  test("the PII taint gate catches flow through renames, hashes, and concat") {
    val cu = graft.Tables(spark, sf, "customer")
    val published = cu.select(
      $"c_custkey".as("id"),
      sha2($"c_name".cast("binary"), 256).as("name_digest"),
      concat($"c_mktsegment", lit("#"), $"c_nationkey").as("segment_tag"),
      $"c_acctbal".as("balance"))
    val tainted = ColumnLineage.taintedBy(published, Set("c_name", "c_phone"))
    assert(tainted === Set("name_digest"),
      s"a hash of PII is still PII lineage; nothing else flows: $tainted")
    // a window function derivation taints through its input
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_mktsegment").orderBy($"c_custkey")
    val ranked = cu.select($"c_custkey",
      row_number().over(w).as("rn"),
      lag($"c_name", 1).over(w).as("prev_name"))
    val t2 = ColumnLineage.taintedBy(ranked, Set("c_name"))
    assert(t2 === Set("prev_name"), s"window lag must carry lineage: $t2")
  }

  test("a catalog table read keeps its identifier — where catalog-lineage consumers need table identity") {
    withIndexRoot("graft-lineage-cat") {
      // the persisted bucketed edge table (D75's shape): read back via
      // spark.table(), its lineage must carry the catalog identifier,
      // not an opaque "relation" or a bare path leaf
      val G = graft.operators.GraphRank
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      val path = tmpDir("graft-lineage-edges") + "/edges_tbl"
      G.ensureBucketedEdges(spark, "lineage_edges_spec", path, edges)
      try {
        val t = spark.table("lineage_edges_spec")
          .select($"src", ($"deg" * 2).as("deg2"))
        val srcs = ColumnLineage.sources(t)
        assert(srcs("src") === Set("spark_catalog.default.lineage_edges_spec.src"),
          s"catalog identity must survive into lineage: $srcs")
        assert(srcs("deg2") === Set("spark_catalog.default.lineage_edges_spec.deg"),
          s"derived columns must carry the catalog-qualified source: $srcs")
      } finally spark.sql("DROP TABLE IF EXISTS lineage_edges_spec")
    }
  }
}
