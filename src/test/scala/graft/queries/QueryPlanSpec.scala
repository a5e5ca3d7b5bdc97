package graft.queries

import graft.{QueryRegistry, SparkSpec}

/** Smoke + physical-plan assertions for every registered query at
  * sf0.001 (SURVEY.md §4 — the plans we claim are the plans we get).
  * Numeric correctness is the driver's DuckDB gate; here we pin SHAPE:
  * broadcasts where intended, no cartesian products, pushed filters. */
class QueryPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    QueryRegistry.asMap(name)(spark, sf).queryExecution.executedPlan.toString

  test("every registered query runs and returns rows at sf0.001") {
    QueryRegistry.all.foreach { q =>
      val n = q.fn(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("q03/q04: dims broadcast by explicit hint; fact join shuffles") {
    // disable auto-broadcast so only the EXPLICIT broadcast() hints
    // survive — this is what the plan degrades to at 100 TB where no
    // fact table fits the threshold
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(plan("q03_broadcast_join_agg").contains("BroadcastHashJoin"))
      val p4 = plan("q04_star_join")
      assert(p4.contains("BroadcastHashJoin"), "hinted dims must broadcast")
      // the fact-fact join (lineitem ⋈ orders, unhinted) must shuffle
      assert(p4.contains("SortMergeJoin") || p4.contains("ShuffledHashJoin"),
        "fact join must not broadcast at scale")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("q02: predicates are pushed to the parquet scan") {
    val p = plan("q02_selective_filter")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
  }

  test("no cartesian products anywhere; ANN candidates are equi-joins") {
    QueryRegistry.all.foreach { q =>
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      // BroadcastNestedLoopJoin against a bounded broadcast side (the
      // 5-row query set in v01) is a deliberate O(N·k) map-side
      // expansion and allowed; a true CartesianProduct (shuffle both
      // sides, O(N²)) never is.
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      if (q.name == "v04_lsh_ann")
        assert(p.contains("BroadcastHashJoin"),
          "IVF candidate generation must be a hash equi-join on bucket")
    }
  }

  test("q25: bloom prune filters the lineitem branch below the join") {
    val p = plan("q25_bloom_pruned_join")
    assert(p.contains("might_contain"),
      "the bloom probe must appear in the physical plan")
    // the probe must sit in the lineitem scan branch (map-side,
    // before any exchange), not above the join
    val scanIdx = p.indexOf("lineitem")
    val probeIdx = p.indexOf("might_contain")
    assert(scanIdx >= 0 && probeIdx >= 0)
    val joinIdx = p.indexOf("Join")
    assert(probeIdx > joinIdx,
      "probe must be deeper in the tree than the topmost join node")
  }

  test("q26: the range join is a bucket equi-join, never a nested loop") {
    val p = plan("q26_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must not plan a nested-loop/cartesian join")
    assert(p.contains("__bucket") || p.contains("HashJoin"),
      "bucket key must drive a hash equi-join")
  }

  test("v04 IVF ANN achieves recall ≥ 0.4 vs exact KNN at sf0.001") {
    val exact = QueryRegistry.asMap("v01_knn_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = QueryRegistry.asMap("v04_lsh_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(f"IVF nprobe=2/16 recall vs exact top-3: $recall%.2f")
    assert(recall >= 0.4, f"IVF recall $recall%.2f < 0.4")
  }

  test("v04 trained pivots: quantization improves over the lowest-id seeds; recall floor holds") {
    // What Lloyd training GUARANTEES (and the spec pins) is the
    // k-means objective ON THE TRAINING SET: mean cosine of each
    // sample vector to its assigned pivot is monotone non-decreasing
    // per iteration from the seed assignment — trained pivots quantize
    // the sample at least as tightly as the raw lowest-id sample seeds
    // they grew from (full-corpus objective is measured and reported
    // but carries no per-iteration guarantee once training reads only
    // the sample). Top-3 recall on 15 exact pairs at N = 500 is NOT
    // monotone in pivot quality (at this scale nProbe=2 over B=16
    // buckets is the binding constraint and tiny-sample noise
    // dominates), so recall keeps its FLOOR assertion while the
    // deterministic objective improvement carries the trained-vs-seed
    // comparison.
    import graft.functions.{DetHash, VectorOps}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val ev = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
    val sample = ev.toDF("vec_id", "v")
      .where(DetHash.hash60(col("vec_id"), graft.operators.IndexStore.SampleSalt)
        % graft.operators.IndexStore.SampleMod === 0)
      .as[(Long, Array[Double])]
    val n = ev.count()
    val k = VectorQueries.adaptiveB(n).toInt
    val sampleIds = sample.map(_._1).collect().sorted.take(k).toSet
    val seeded = sample.filter(r => sampleIds.contains(r._1))
      .collect().sortBy(_._1).map(_._2)
    val trained = graft.operators.IndexStore
      .ivfPivots(spark, sf, VectorQueries.IvfTrainIters)
    def objective(on: org.apache.spark.sql.Dataset[(Long, Array[Double])],
        pivots: Array[Array[Double]]): Double = {
      val bc = spark.sparkContext.broadcast(pivots)
      val total = on.map { case (_, v) =>
        VectorOps.cosine6(v, bc.value(VectorOps.nearest2Pivots(v, bc.value)._1))
      }.reduce(_ + _)
      total / on.count()
    }
    val (objT, objS) = (objective(sample, trained), objective(sample, seeded))
    val objFull = objective(ev, trained)
    info(f"mean assigned-pivot cosine on sample: trained=$objT%.4f vs seeded=$objS%.4f" +
      f" (full corpus, trained: $objFull%.4f)")
    assert(objT >= objS - 1e-9,
      f"Lloyd training must not worsen the sample quantization objective: $objT%.4f < $objS%.4f")
    // and the ANN recall floor still holds with trained pivots
    val exact = QueryRegistry.asMap("v01_knn_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val got = VectorQueries.ivfCandidates(spark, sf, trainedPivots = true)
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"trained-pivot recall vs exact top-3: $recall%.2f")
    assert(recall >= 0.4, f"trained-pivot recall $recall%.2f < 0.4")
  }

  test("v10 PQ: broadcast-only plan; ADC shortlist + refine finds true neighbors") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // plan shape: encoding + ADC are broadcast-codebook map work, and
    // the refine stage fetches raw vectors through a BROADCAST join of
    // the Q×C shortlist — no shuffled join anywhere
    val p = plan("v10_pq_adc_knn")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"PQ must not shuffle-join the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the refine fetch must broadcast the bounded shortlist:\n$p")
    // quality: top-3 via 16-byte codes (+ exact refine) vs exact-L2
    // top-3 on the raw 512-byte vectors
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.where($"vec_id" < 5).select($"vec_id".as("qid"), $"v".as("qv"))
    val l2 = aggregate(zip_with($"v", $"qv", (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d", $"vec_id")
    val exact = e.crossJoin(broadcast(q)).where($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", l2.as("d"))
      .withColumn("rnk", row_number().over(w)).where($"rnk" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = QueryRegistry.asMap("v10_pq_adc_knn")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    info(f"PQ ADC recall vs exact L2 top-3: $recall%.2f")
    assert(recall >= 0.4, f"PQ recall $recall%.2f < 0.4")
  }

  test("v12 IVFADC: bucket-pruned scan (scanned ≪ N), no shuffle join; recall reported") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // plan: like v10, candidate generation is broadcast-artifact map
    // work and the refine/scanned joins broadcast bounded frames —
    // no shuffled join anywhere
    val p = plan("v12_ivfadc_knn")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"IVFADC must not shuffle-join the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the refine fetch must broadcast the bounded shortlist:\n$p")
    // the candidate read is parquet PARTITION PRUNING over the
    // persisted encoded index: bucket IN (probed cells)
    assert(p.contains("PartitionFilters: [bucket#") && p.contains(" IN ("),
      s"the index scan must carry the probed-bucket partition filter:\n$p")
    val rows = QueryRegistry.asMap("v12_ivfadc_knn")(spark, sf).collect()
    val n = graft.Tables(spark, sf, "embeddings").count()
    // the POINT of the IVF restriction: each query ADC-scores only its
    // nprobe=2 cells, never the corpus (v10 scans all N−1)
    val maxScanned = rows.map(_.getAs[Long]("scanned")).max
    info(s"max per-query ADC-scanned candidates: $maxScanned of ${n - 1}")
    assert(maxScanned < n - 1,
      s"IVF restriction must prune the ADC scan: scanned $maxScanned of N=$n")
    // recall vs exact-L2 top-3 (the restriction trades recall for the
    // pruned scan; the floor pins it doesn't collapse)
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.where($"vec_id" < 5).select($"vec_id".as("qid"), $"v".as("qv"))
    val l2 = aggregate(zip_with($"v", $"qv", (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d", $"vec_id")
    val exact = e.crossJoin(broadcast(q)).where($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id", l2.as("d"))
      .withColumn("rnk", row_number().over(w)).where($"rnk" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"IVFADC recall vs exact L2 top-3: $recall%.2f")
    assert(recall >= 0.4, f"IVFADC recall $recall%.2f < 0.4")
  }

  test("v04: the ivf-flat artifact scan is pruned to the probed cells") {
    // the cell1-partitioned artifact (r7) turns the probe restriction
    // into reader-level partition pruning — the warm candidate stage
    // reads ≈ nprobe/B of the index files, not the whole assignment
    val p = plan("v04_lsh_ann")
    assert(p.contains("PartitionFilters: [cell1#") && p.contains(" IN ("),
      s"the ivf-flat scan must carry the probed-cell partition filter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate generation must stay a broadcast equi-join on bucket:\n$p")
  }

  test("v21 filtered ANN: pruned scan kept, predicate filters before scoring, k filled from allowed only") {
    // the filter-aware probing leg: the metadata semi-join must not
    // cost the partition pruning, and every served neighbor satisfies
    // the predicate (pre-filter semantics — k is filled from ALLOWED
    // candidates, never under-filled by a post-filter discard)
    val p = plan("v21_filtered_ivf_ann")
    assert(p.contains("PartitionFilters: [cell1#") && p.contains(" IN ("),
      s"the filtered path must keep the probed-cell partition filter:\n$p")
    val rows = QueryRegistry.asMap("v21_filtered_ivf_ann")(spark, sf).collect()
    assert(rows.nonEmpty)
    val en = graft.Tables(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(en.contains(r.getLong(2)),
      s"neighbor ${r.getLong(2)} must satisfy the metadata predicate"))
  }

  test("c12 warm hybrid: both legs read persisted indexes, never the documents table") {
    // run once so the artifacts exist, then inspect the warm plan
    QueryRegistry.asMap("c12_indexed_hybrid_rrf")(spark, sf).collect()
    val warm = QueryRegistry.asMap("c12_indexed_hybrid_rrf")(spark, sf)
    val paths = warm.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(!paths.exists(_.contains("documents.parquet")),
      s"warm hybrid retrieval must never scan the documents table: $paths")
    assert(paths.exists(_.contains("bm25_postings")),
      s"the lexical leg must read the posting artifact: $paths")
    assert(paths.exists(_.contains("ivf_flat")),
      s"the vector leg must read the flat-index artifact: $paths")
    // the only raw-table touch is the bounded query-vector fetch
    // (vec_id < 5, pushed down) — and the flat-index read is pruned
    val p = warm.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cell1#"),
      s"the vector leg's index read must stay partition-pruned:\n$p")
  }

  test("v15: the chunk scan is pruned to probed cells; scanned ≪ total chunks") {
    val p = plan("v15_ivf_chunk_maxsim")
    assert(p.contains("PartitionFilters: [cell1#") && p.contains(" IN ("),
      s"the chunk read must carry the probed-cell partition filter:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"chunk admission must stay a broadcast equi-join:\n$p")
    val rows = QueryRegistry.asMap("v15_ivf_chunk_maxsim")(spark, sf).collect()
    val n = graft.Tables(spark, sf, "embeddings").count()
    val maxScanned = rows.map(_.getAs[Long]("scanned")).max
    info(s"max per-query admitted chunks: $maxScanned of ${n}")
    assert(maxScanned < n,
      s"IVF restriction must prune the chunk scan: scanned $maxScanned of N=$n")
    // the restricted top-10 must stay close to exhaustive v14's: the
    // probed cells are where the high-sim chunks live by construction
    val exact = QueryRegistry.asMap("v14_chunk_maxsim")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"v15 doc recall vs exhaustive v14 top-10: $recall%.2f")
    assert(recall >= 0.4, f"IVF-restricted MaxSim recall $recall%.2f < 0.4")
  }

  test("adaptiveB: broadcast ceiling holds at any corpus size") {
    // √(N/8) alone grows the pivot broadcast unboundedly (~180 MB of
    // dim-64 doubles at N = 10¹²); the cap pins it
    assert(VectorQueries.adaptiveB(2000L) === 16L, "gate-SF B must stay 16")
    assert(VectorQueries.adaptiveB(8L * 65536L * 65536L) === 65536L)
    assert(VectorQueries.adaptiveB(Long.MaxValue / 4) === 65536L)
    val maxBytes = VectorQueries.MaxPivots * 64 * 8
    assert(maxBytes <= 64L * 1024 * 1024,
      s"capped pivot broadcast must stay tens of MB at dim 64, got $maxBytes B")
  }

  test("q19/q22: one hash shuffle each (the union+window / lag+cumsum claim)") {
    // both queries claim "a single shuffle on the key"; the only other
    // exchange allowed is the final presentation orderBy (range
    // partitioning), which the gate would tolerate dropping
    for (name <- Seq("q19_asof_join", "q22_sessionize")) {
      val p = plan(name)
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashExchanges === 1,
        s"$name must shuffle exactly once on its key, found $hashExchanges:\n$p")
    }
  }

  test("measured shuffle volumes match the PLANS.md cost model") {
    import graft.tools.PlanMetrics
    val events = graft.Tables(spark, sf, "events").count()
    // q22: the hash exchange carries each event exactly once; the only
    // other exchange is the presentation orderBy over per-user rows
    val q22 = PlanMetrics.shuffles(
      QueryRegistry.asMap("q22_sessionize")(spark, sf))
    val hash22 = q22.filter(_.partitioning.startsWith("hashpartitioning"))
    assert(hash22.map(_.rows) === Seq(events),
      s"q22 must shuffle each event exactly once: $q22")
    // d01: the cost-model BOUND — no shuffle exchange may carry more
    // than the banded volume (13 band rows per doc). At this scale the
    // banded self-join side is broadcast, so the measured exchanges
    // are candidate/verify stages, all far below the bound.
    val docs = graft.Tables(spark, sf, "documents").count()
    val d01 = PlanMetrics.shuffles(
      QueryRegistry.asMap("d01_minhash_lsh_dedup")(spark, sf))
    assert(d01.nonEmpty)
    assert(d01.forall(_.rows <= docs * 13),
      s"no d01 exchange may exceed the banded volume (13·$docs): $d01")
    // d02: linear term = 8 exact + 136 probe rows per doc; no exchange
    // may exceed the probe fan-out (the quadratic candidate term is
    // pinned separately by DedupSpec's candidate-rate bound)
    val d02 = PlanMetrics.shuffles(
      QueryRegistry.asMap("d02_simhash_dedup")(spark, sf))
    assert(d02.nonEmpty)
    assert(d02.forall(_.rows <= docs * 144),
      s"no d02 exchange may exceed the multi-probe volume (144·$docs): $d02")
  }

  test("q24: correlated subqueries are fully decorrelated (joins, no Subquery nodes)") {
    val p = plan("q24_correlated_subquery")
    assert(p.contains("LeftAnti"), "NOT EXISTS must become an anti join")
    assert(!p.toLowerCase.contains("subquery"),
      s"no per-row subquery may survive decorrelation:\n$p")
  }

  test("c05 two-level packing: no full-corpus window partitioned by lang alone") {
    val p = plan("c05_sequence_packing")
    // the running sum over documents must partition by (lang, shard) —
    // a window partitioned by ~5-valued lang alone funnels every doc
    // of a language through one task at corpus scale
    assert("windowspecdefinition\\(lang#\\d+, shard#\\d+L?, doc_id#".r
      .findFirstIn(p).isDefined,
      s"two-level (lang, shard) running-sum window missing:\n$p")
    assert("windowspecdefinition\\(lang#\\d+, doc_id#".r.findFirstIn(p).isEmpty,
      s"per-lang full-corpus window (single-reducer funnel) present:\n$p")
  }

  test("t09/t10: global rank windows run above the bounded top-k limit") {
    // the unpartitioned row_number window is benign ONLY because it
    // sees <= k rows (it sits above orderBy+limit, which compiles to
    // TakeOrderedAndProject); pin that so a refactor can't silently
    // move the window below the limit onto the full corpus
    for (name <- Seq("t09_vocab_topk", "t10_tfidf_rank")) {
      val p = plan(name)
      val wi = p.indexOf("Window")
      val ti = p.indexOf("TakeOrderedAndProject")
      assert(wi >= 0 && ti >= 0,
        s"$name: expected Window + TakeOrderedAndProject in:\n$p")
      assert(wi < ti,
        s"$name: unpartitioned window must sit ABOVE the limit (<= k rows):\n$p")
    }
  }

  test("t11 contamination: eval side broadcasts, one pair-agg shuffle only") {
    val p = plan("t11_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"eval gram set must broadcast (corpus side stays map-side):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"train grams must never reach a shuffle join:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1,
      s"only the matched-pair aggregation may shuffle, found $hashExchanges:\n$p")
  }

  test("q11 two-phase top-k: both window passes present, salted first") {
    val p = plan("q11_topk_per_group")
    // two Window operators: (n_name, pid) then (n_name)
    assert("Window".r.findAllIn(p).length >= 2, "expected two window passes")
    assert(p.contains("spark_partition_id") || p.contains("pid"),
      "salted pre-pass missing")
  }

  test("q27: the anomaly frame is bounded ROWS, never an unbounded window") {
    val p = plan("q27_rolling_zscore")
    assert(p.contains("specifiedwindowframe(RowFrame, -7, -1)"),
      s"expected the bounded trailing ROWS frame in:\n$p")
    assert(!p.toLowerCase.contains("unboundedpreceding"),
      s"no unbounded frame may appear (state must stay 7 rows/key):\n$p")
  }

  test("t15: repetition scoring plans no join at all (per-doc map work)") {
    val p = plan("t15_repetition_filter")
    assert(!p.contains("Join"),
      s"duplicate-trigram fraction must never join across docs:\n$p")
  }

  test("t13: PII scrub shuffles only aggregate rows, never text") {
    val p = plan("t13_pii_scrub")
    assert(!p.contains("Join"), s"scrub is a pure map + agg:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1,
      s"only the per-source aggregate may shuffle, found $hashExchanges:\n$p")
  }

  test("t19: classifier inference broadcasts the weights; text never shuffles") {
    // the hashing-trick inference shape: the 4096-row model rides a
    // broadcast, the only hash exchanges carry (doc, lang) aggregate
    // rows — raw text stays map-side
    val p = plan("t19_quality_classifier")
    assert(p.contains("BroadcastHashJoin"),
      s"the weight table must broadcast into the feature join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"inference must never shuffle-join the corpus against the model:\n$p")
    val shuffled = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).mkString("\n")
    assert(!shuffled.contains("text#"),
      s"raw text must never transit a shuffle:\n$shuffled")
  }

  test("v09 radius search: every hit is a true hit; recall vs exact is reported") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.where($"vec_id" < 5).select($"vec_id".as("query_id"), $"v".as("qv"))
    val exact = e.crossJoin(broadcast(q))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        VectorQueries.cosine6($"v", $"qv").as("sim"))
      .where($"sim" >= 0.25)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val got = QueryRegistry.asMap("v09_radius_search")(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact),
      "radius search must never report a below-threshold pair (exact re-verify)")
    val recall = got.size.toDouble / math.max(1, exact.size)
    info(f"radius recall vs exact at sf0.001: $recall%.2f (${got.size}/${exact.size})")
    assert(recall >= 0.4, f"radius recall $recall%.2f < 0.4")
  }

  test("c13: Gumbel top-k selection plans as TakeOrdered, not a global sort") {
    val p = QueryRegistry.asMap("c13_dsir_resample")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"the 100-doc selection must be a bounded heap top-k:\n${p.take(2000)}")
    // the display-rank window must ride ABOVE the limit (≤100 rows),
    // so at most one Window node and no Sort below an Exchange-wide
    // frame — the t09/t10 discipline
    assert(p.sliding("Window".length).count(_ == "Window") <= 2,
      "only the bounded post-limit rank window may appear")
  }

  test("v16 Hamming ANN: measured recall vs exact top-10, integer candidate stage") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val e = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.where($"vec_id" < 5).select($"vec_id".as("query_id"), $"v".as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"sim".desc, $"vec_id")
    val exact = e.crossJoin(broadcast(q))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        VectorQueries.cosine6($"v", $"qv").as("sim"))
      .withColumn("rnk", row_number().over(w)).where($"rnk" <= 10)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val got = QueryRegistry.asMap("v16_hamming_ann")(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"sign-bit Hamming recall@10 vs exact: $recall%.2f")
    assert(recall >= 0.4, f"Hamming recall $recall%.2f < 0.4")
  }

  test("v08: candidate generation is TakeOrdered, not a global sort/window") {
    // the query fn collects the candidates (driver-side greedy), so
    // pin the DISTRIBUTED candidate stage directly
    val p = VectorQueries.mmrCandidates(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"bounded top-C must plan as TakeOrdered pruning:\n$p")
    assert(!p.contains("Window"),
      s"no rank window may appear in the candidate stage:\n$p")
  }

  test("c08/c09 sampling windows are WindowGroupLimit-pruned") {
    Seq("c08_cluster_balanced_sample", "c09_weighted_sample").foreach { n =>
      val p = plan(n)
      assert(p.contains("WindowGroupLimit"),
        s"$n: per-partition rank-limit pushdown missing:\n$p")
    }
  }

  test("q28: the z-value audit scans only the two layout columns") {
    val p = plan("q28_zorder_layout")
    // column pruning must reach the scan — the z bit math needs only
    // (l_partkey, l_suppkey); reading more at 100 TB is reading TBs
    // of dead columns
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_partkey") && read.contains("l_suppkey"))
    assert(!read.contains("l_extendedprice") && !read.contains("l_comment"),
      s"q28 must prune to the two layout columns:\n$read")
    assert(!p.contains("Window"), "q28 is agg-only; no window may appear")
  }

  test("d08: merge is union + ONE per-key window, never a join") {
    val p = plan("d08_snapshot_upsert")
    assert(p.contains("Union"), s"merge must be union-based:\n$p")
    assert("Window\\b".r.findAllIn(p).size >= 1 && p.contains("row_number"))
    // a full-outer-join merge would build hash tables of BOTH sides;
    // the union+window shape is the whole point of SnapshotMerge
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("BroadcastHashJoin"),
      s"d08 must not plan any join:\n$p")
    // WindowExec renders as `Window [exprs], [partition spec], [order spec]`
    // — the partition spec must carry the merge key, or the whole corpus
    // funnels through one reducer (the c05 round-3 failure mode)
    val wline = p.linesIterator.find(_.contains("Window ")).getOrElse(
      fail(s"no Window node in d08 plan:\n$p"))
    assert(wline.contains("doc_id#"),
      s"the merge window must partition by the key, never global:\n$wline")
  }

  test("t17: boilerplate flag rides the ONE segment exchange; no join anywhere") {
    val df = QueryRegistry.asMap("t17_boilerplate_removal")(spark, sf)
    df.collect() // finalize the adaptive plan
    // AdaptiveSparkPlan.toString prints Final AND Initial plans — pin
    // the final one only, or every count below doubles
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the r16 shape: min(doc_id)≠max(doc_id) window over seg computes
    // the ≥2-docs flag inside the one exchange the segment mass must
    // cross anyway — the previous countDistinct-agg + join-back
    // shuffled that mass three times for the same boolean
    assert(!p.contains("Join"),
      s"t17 must not join — the boiler flag is a window in the segment exchange:\n$p")
    val wline = p.linesIterator.find(_.contains("Window ")).getOrElse(
      fail(s"no Window node in t17 plan:\n$p"))
    assert(wline.contains("seg#"),
      s"the boiler window must partition by seg, never global:\n$wline")
    // segment mass crosses exactly two hash exchanges: seg (window)
    // and doc_id (reassembly agg); a third would mean the join-back
    // shape crept back in
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"t17 must shuffle the segment mass exactly twice (seg, doc_id):\n$p")
  }

  test("q32: merged read = one layout scan + two anti-joins with tombstones built") {
    val p = plan("q32_deletion_vectors")
    // both tombstone tables are deleted-row-sized → size-based
    // planning must BUILD them (broadcast at this SF), never the
    // corpus side; and merge-on-read must never join the layout to
    // itself
    val antiJoins = p.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti"))
    assert(antiJoins === 2,
      s"merge-on-read must be exactly two broadcast anti-joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join in the merged read:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("m06: candidate generation is a hash equi-join on band words, never pixels") {
    // the registered query's plan is ALWAYS the artifact-read shape:
    // cachedTable builds the hash table eagerly (its own job) and
    // returns the parquet read, so decoded pixels never appear in
    // the query plan at all — that IS the once-per-corpus-lifetime
    // claim, pinned here; the decode boundary itself is pinned on
    // the builder stage's own plan below
    withIndexRoot("graft-m06-plan") {
      val df = QueryRegistry.asMap("m06_phash_near_dup")(spark, sf)
      df.collect() // finalize the adaptive plan
      val p = df.queryExecution.executedPlan.toString
      // the band self-join and the two hash join-backs are all hash
      // equi-joins over 8-byte hash words
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"m06 candidates must come from band equality, not all-pairs:\n$p")
      assert(!p.contains("SerializeFromObject"),
        s"the query plan must read the persisted hash table, not decode:\n$p")
      assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)".r
        .findAllIn(p).nonEmpty, s"band join missing:\n$p")
    }
    // the builder stage is where the typed decode boundary lives
    import spark.implicits._
    val media = Seq(graft.multimodal.Multimodal.MediaRow(1L,
      graft.multimodal.Multimodal.MediaMeta("image", "png", 32, 32, 0, 0),
      graft.multimodal.Multimodal.synthGrayPng(1L, perturbed = false))).toDS()
    val bp = graft.multimodal.Multimodal.aHashTable(media)
      .queryExecution.executedPlan.toString
    assert(bp.contains("SerializeFromObject"),
      s"the builder must carry the mapPartitions decode boundary:\n$bp")
  }

  test("d01/d02/d06: the candidate budget admission never rides the query plan as a global window") {
    // the r7 scale caveat, closed in two steps: the cumulative sum
    // became a two-pass range-partitioned prefix sum (offsets = a
    // driver fold over ≤ one row per shuffle partition), and the r8
    // advice moved its materialization INSIDE admit (eager
    // localCheckpoint, pin released) so no consumer job can ever
    // recompute the range exchange. The final query plans therefore
    // contain NO admission window at all — the keep/skip frames read
    // the materialized slice set (ExistingRDD) — and any window that
    // does remain must be partitioned (never a data-sized global
    // running sum). The internal frame's range-sliced shape is pinned
    // in CandidateBudgetSpec.
    withIndexRoot("graft-budget-plan") {
      Seq("d01_minhash_lsh_dedup", "d02_simhash_dedup",
          "d06_sharded_simhash", "q57_frequent_pairs").foreach { name =>
        val df = QueryRegistry.asMap(name)(spark, sf)
        df.collect() // finalize the adaptive plan
        val p = df.queryExecution.executedPlan.toString
        val wlines = p.linesIterator.filter(_.contains("Window ")).toSeq
        assert(wlines.isEmpty,
          s"$name must carry no admission window (r7 had only those):\n${wlines.mkString("\n")}")
        // the admission reaches the consumer as either the
        // materialized slice checkpoint (ExistingRDD — binding
        // budget) or, since r11, the fast path's LOCAL relations (a
        // literal zero disclosure + provably-empty tail when the
        // budget covers everything) — both shapes mean no consumer
        // can ever recompute the admission's exchange
        assert(p.contains("ExistingRDD") || p.contains("LocalTableScan"),
          s"$name must consume the materialized or local admission:\n$p")
      }
    }
  }
}
