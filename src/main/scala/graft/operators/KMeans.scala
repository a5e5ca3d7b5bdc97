package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed Lloyd's k-means over an embedding corpus — the
  * clustering primitive behind cluster-balanced curation (c08) and
  * sampled-k-means IVF pivot training (the production source of v04's
  * coarse quantizer; reference similarity surface: README.md:11's
  * grouped analytics generalized to vector space).
  *
  * Scale shape (the only one that survives 100 TB):
  *  - centroids live on the DRIVER (k × dim × 8 bytes — ~5 MB at
  *    k = 10⁴, dim 64; the budget is dim-dependent, so at dim 768 the
  *    same 5 MB buys only k ≈ 800, and k beyond ~10⁴·(64/dim) should
  *    move to a two-level quantizer rather than a bigger broadcast)
  *    and ship to executors per iteration;
  *  - assignment is a map-side argmax over the broadcast centroids —
  *    ZERO shuffle, no N×k relational join materialized anywhere
  *    (v04's scaladoc records the measured 58 s vs 4 s cost of the
  *    crossJoin+max_by formulation at the 100× replica);
  *  - the recompute step is one partial-aggregated shuffle per
  *    iteration carrying at most k × numPartitions partial vectors
  *    ([[VectorAgg.meanAggregator]] — O(dim) state, map-side combine);
  *  - per-iteration driver state is the new centroid array only.
  *
  * Determinism (the oracle contract): init = the k lowest-id vectors;
  * assignment ranks by cosine6 (rounded) with ties to the lowest
  * centroid id; recomputed means are rounded to 8 decimals (the v03
  * contract that absorbs summation-order effects). Every step is a
  * pure function of the data, so a SQL engine can replay the whole
  * fit by unrolling the iterations.
  *
  * Spherical k-means (cosine assignment + arithmetic-mean centroids):
  * the text-embedding variant. Empty clusters simply drop out of the
  * centroid set for later iterations (ids of surviving clusters are
  * stable — centroids are keyed by id, never by array position).
  */
object KMeans {

  /** The trained centroid ARRAY alone — (seed id, round-8 mean),
    * sorted ascending by id: the IVF pivot-training entry point
    * (v04/v09/d03 seed their coarse quantizers here). Same loop as
    * [[fit]]; callers that need per-vector assignments use fit, which
    * delegates here. */
  def centroids(
      ev: Dataset[(Long, Array[Double])],
      k: Int,
      iters: Int): Array[(Long, Array[Double])] = {
    val spark = ev.sparkSession
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")

    // the fit itself reads the input iters+1 times (seed take + one
    // assign+mean action per iteration) — cache across those; any
    // frame the CALLER builds over the result is lazy and executes
    // after this cache is dropped, re-reading the source once like
    // any other query. Only persist (and later unpersist) if the
    // CALLER hasn't already: Spark's CacheManager is plan-keyed, so
    // unpersisting here would silently drop a caller's own cache of
    // the same Dataset out from under its post-training consumers.
    val ownsCache = ev.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val cached = if (ownsCache) ev.persist() else ev
    try {
      // the k LOWEST-id vectors, whatever the id domain (distributed
      // TakeOrdered — never assumes ids are contiguous or 0-based)
      var cs: Array[(Long, Array[Double])] =
        cached.toDF("id", "v").orderBy($"id").limit(k)
          .as[(Long, Array[Double])].collect().sortBy(_._1)
      require(cs.nonEmpty, "k-means init found no vectors")

      for (_ <- 1 to iters) {
        val bc = spark.sparkContext.broadcast(cs)
        val assigned = cached
          .map { case (_, v) => (VectorOps.nearestCentroidSim(v, bc.value)._1, v) }
          .toDF("cluster_id", "v")
        cs = assigned
          .groupBy($"cluster_id")
          .agg(VectorAgg.vectorMean($"v").as("mv"))
          .select($"cluster_id",
            transform($"mv", x => round(x, 8)).as("cv"))
          .as[(Long, Array[Double])]
          .collect()
          .sortBy(_._1)
        bc.destroy() // the collect above consumed it; don't leak k×dim per iteration
      }
      cs
    } finally if (ownsCache) cached.unpersist()
  }

  /** Fit k centroids with `iters` Lloyd iterations and return the
    * final assignment: one row per input vector —
    * (vec_id, cluster_id, sim). `cluster_id` is the id of the seed
    * vector that initialized the cluster; `sim` the rounded cosine to
    * the final centroid. */
  def fit(
      ev: Dataset[(Long, Array[Double])],
      k: Int,
      iters: Int): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val cs = centroids(ev, k, iters)
    // the final broadcast stays alive: the returned (lazy) DataFrame
    // reads it when the caller executes
    val bc = spark.sparkContext.broadcast(cs)
    ev.map { case (id, v) =>
      val (cid, sim) = VectorOps.nearestCentroidSim(v, bc.value)
      (id, cid, sim)
    }.toDF("vec_id", "cluster_id", "sim")
  }
}
