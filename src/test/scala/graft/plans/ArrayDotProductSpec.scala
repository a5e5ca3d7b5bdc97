package graft.plans

import graft.{SparkSpec, Tables}
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

class ArrayDotProductSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native dot product == HOF fold bit-for-bit on real embeddings") {
    val e = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pair = e.as("a").crossJoin(e.as("b"))
      .where($"a.vec_id" < 50 && $"b.vec_id" < 50)
    val diff = pair.select(
      ArrayDotProduct.fastDot($"a.v", $"b.v").as("native"),
      VectorQueries.dotHof($"a.v", $"b.v").as("hof"))
      .where(!($"native" <=> $"hof"))
    assert(diff.count() === 0)
  }

  test("null array yields null; mismatched lengths use shorter") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0)))).toDF("a", "b")
    val out = df.select(ArrayDotProduct.fastDot($"a", $"b").as("d"))
      .as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(32.0), None, Some(3.0)))
  }

  test("SQL function registration via GraftExtensions.register") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r === 11.0)
    val c = spark.sql(
      "SELECT array_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(c === 1.0)
  }

  test("fused cosine == composed dot/norm/norm bit-for-bit on real embeddings") {
    val e = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pair = e.as("a").crossJoin(e.as("b"))
      .where($"a.vec_id" < 50 && $"b.vec_id" < 50)
    val composed = ArrayDotProduct.fastDot($"a.v", $"b.v") /
      (sqrt(ArrayDotProduct.fastDot($"a.v", $"a.v")) *
        sqrt(ArrayDotProduct.fastDot($"b.v", $"b.v")))
    val diff = pair.select(
      ArrayCosine.fastCosine($"a.v", $"b.v").as("fused"),
      composed.as("composed"))
      .where(!($"fused" <=> $"composed"))
    assert(diff.count() === 0)
  }

  test("fused cosine rejects mismatched lengths (no silent truncated norms)") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(ArrayCosine.fastCosine($"a", $"b")).collect()
    }
    def chain(t: Throwable): Boolean =
      t != null && (Option(t.getMessage)
        .exists(_.contains("equal-length")) || chain(t.getCause))
    assert(chain(e), s"expected equal-length error, got: ${e.getMessage}")
  }

  test("fused cosine participates in codegen") {
    val e = Tables(spark, sf, "embeddings")
      .select($"embedding".cast("array<double>").as("v"))
    val plan = e.select(ArrayCosine.fastCosine($"v", $"v").as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [array_cosine"),
      s"fused cosine projection must stay inside a codegen stage:\n$plan")
  }

  test("expression participates in codegen (no CodegenFallback)") {
    val e = Tables(spark, sf, "embeddings")
      .select($"embedding".cast("array<double>").as("v"))
    val plan = e.select(ArrayDotProduct.fastDot($"v", $"v").as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks an operator inside a WholeStageCodegen
    // stage; a CodegenFallback expression would strip it
    assert(plan.contains("*(1) Project [array_dot_product"),
      s"dot-product projection must stay inside a codegen stage:\n$plan")
  }
}
