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

  test("c13: DSIR resample enriches the target slice but still explores") {
    val out = CurationQueries.c13DsirResample.fn(spark, dir).collect()
    assert(out.length == 100)
    assert(out.map(_.getInt(0)).toSeq == (1 to 100))
    // importance sampling must pull the selection TOWARD the target
    // (en) distribution...
    val docs = graft.Tables(spark, dir, "documents")
    val corpusEn = docs.where($"lang" === "en").count().toDouble / docs.count()
    val sampleEn = out.count(_.getString(2) == "en") / 100.0
    info(f"en share: corpus $corpusEn%.2f -> sample $sampleEn%.2f")
    assert(sampleEn > corpusEn,
      f"resample en share $sampleEn%.2f should exceed corpus $corpusEn%.2f")
    // ...but the Gumbel noise must RESAMPLE, not just take the top
    // 100 scores — the published DSIR property that preserves
    // diversity (a pure argmax selection would collapse onto the most
    // target-like docs)
    assert(sampleEn < 1.0, "Gumbel resampling should admit non-target docs")
    val scores = out.map(_.getLong(3))
    val deterministicTop = CurationQueries.c13DsirResample.fn(spark, dir)
    assert(scores.min < deterministicTop.agg(max($"score_fp"))
      .head().getLong(0), "selection must not be a pure score argmax")
    // determinism: the no-rand() discipline — a replay is bit-identical
    val replay = CurationQueries.c13DsirResample.fn(spark, dir).collect()
    assert(out.map(_.toString).toSeq == replay.map(_.toString).toSeq)
  }
}
