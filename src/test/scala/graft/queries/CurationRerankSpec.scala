package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral properties of the sampling/re-ranking additions — the
  * oracles pin engine parity; these pin that the operators do what
  * their names claim. */
class CurationRerankSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("c09: weighted sample up-weights high-quality docs") {
    val out = CurationQueries.c09WeightedSample.fn(spark, dir)
    val rows = out.select($"lang", $"rnk", $"w").collect()
    assert(rows.nonEmpty)
    // quota and weight-domain sanity
    val perLang = rows.groupBy(_.getString(0))
    perLang.foreach { case (_, rs) =>
      assert(rs.length <= 10)
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length))
    }
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 5))
    // the point of weighting: selected docs are higher-weight on
    // average than the corpus baseline (same shared weight expression)
    val corpusMeanW = graft.Tables(spark, dir, "documents")
      .select(graft.functions.TextStats.qualityWeight($"text").as("w"))
      .agg(avg($"w")).as[Double].head()
    val sampleMeanW = out.agg(avg($"w")).as[Double].head()
    assert(sampleMeanW > corpusMeanW,
      f"weighted sample mean weight $sampleMeanW%.2f should exceed " +
        f"corpus mean $corpusMeanW%.2f")
  }

  test("v08: MMR picks a more diverse set than plain top-k") {
    val e = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    def avgPairSim(ids: Seq[Long]): Double = {
      val a = e.where($"vec_id".isin(ids: _*))
        .select($"vec_id".as("ia"), $"v".as("va"))
      val b = e.where($"vec_id".isin(ids: _*))
        .select($"vec_id".as("ib"), $"v".as("vb"))
      a.crossJoin(b).where($"ia" < $"ib")
        .select(VectorQueries.cosine6($"va", $"vb").as("s"))
        .agg(avg($"s")).as[Double].head()
    }
    val mmrIds = VectorQueries.v08MmrRerank.fn(spark, dir)
      .select($"vec_id").as[Long].collect().toSeq
    assert(mmrIds.length === 5 && mmrIds.distinct.length === 5)
    val qv = e.where($"vec_id" === 0).select($"v".as("q"))
    val top5 = e.where($"vec_id" =!= 0).crossJoin(broadcast(qv))
      .select($"vec_id", VectorQueries.cosine6($"v", $"q").as("qsim"))
      .orderBy($"qsim".desc, $"vec_id").limit(5)
      .select($"vec_id").as[Long].collect().toSeq
    val (mmrSim, topSim) = (avgPairSim(mmrIds), avgPairSim(top5))
    info(f"avg pairwise sim: mmr $mmrSim%.4f vs top-k $topSim%.4f")
    assert(mmrSim < topSim,
      "MMR's selection should be less self-similar than plain top-k")
  }
}
