package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §7.3.4): when one join key
  * carries a disproportionate share of the fact rows (a mega-company,
  * a null-ish default area), a plain shuffle join funnels that key
  * through one reducer. Salting splits each fact row's key into
  * `factor` sub-keys deterministically and replicates the (small)
  * build side across all sub-keys, so the hot key spreads over
  * `factor` reducers.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * covers sort-merge joins at runtime; explicit salting remains the
  * tool when the build side must shuffle too, for deterministic plan
  * shape, or pre-AQE engines. Deterministic salt (hash of a row-unique
  * column, not rand()) keeps retries/replays consistent.
  */
object SkewJoin {

  /** Inner/left equi-join of `fact` (big, skewed) with `dim` (small)
    * on `key`, salted by `factor`. `saltOn` must be a row-stable
    * column of the fact side (e.g. a primary key) — it seeds the salt
    * deterministically. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltOn: Column,
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    // Replicating the dim across `factor` salts is only correct when
    // the dim side never emits unmatched rows: right/full outer would
    // produce `factor` duplicates per unmatched dim key. Fail fast.
    require(
      Set("inner", "left", "leftouter").contains(
        joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltOn), lit(factor)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted
      .join(explodedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** HOT-KEY-TARGETED salting — [[saltedJoin]] refined by the stats
    * catalog's key profile ([[StatsCatalog.ensureKeyProfile]] →
    * [[StatsCatalog.keyProfile]]): only the PROFILED hot keys salt
    * (and only their dim rows replicate ×`factor`); the uniform tail
    * keeps salt 0 and its dim rows stay single. Same result as the
    * uniform salt, a `factor`× smaller dim-replication bill — on a
    * zipfian corpus that is almost the whole bill. `hotKeys` are the
    * profile's string renderings (driver-side, profile-capped —
    * metadata, never a column copy) but the membership test runs in
    * the KEY'S OWN TYPE: each rendering is cast back at PLAN time
    * (Catalyst constant-folds `Cast(Literal)`), so the per-row probe
    * is a typed IN/InSet — never the r12-flagged per-fact-row
    * `cast(string)` on the hot path. An EMPTY list degenerates to a
    * plain equi-join. `partitions` (when the caller's estimator
    * sized the exchange) pre-partitions BOTH sides on
    * (key, __salt) — the join reuses the exchanges, so the shuffle
    * width is the estimate's, not the session default's. Join-type
    * restriction as [[saltedJoin]]. */
  def saltedJoinHot(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltOn: Column,
      factor: Int,
      hotKeys: Seq[String],
      joinType: String = "inner",
      partitions: Option[Int] = None): DataFrame = {
    require(
      Set("inner", "left", "leftouter").contains(
        joinType.toLowerCase.replace("_", "")),
      s"saltedJoinHot supports inner/left joins only, got '$joinType'")
    if (hotKeys.isEmpty)
      return fact.join(dim, Seq(key), joinType)
    val keyType = fact.schema(key).dataType
    val hotLits = hotKeys.map(k => lit(k).cast(keyType))
    val isHot = col(key).isInCollection(hotLits)
    val salted = fact.withColumn("__salt",
      when(isHot, pmod(xxhash64(saltOn), lit(factor))).otherwise(lit(0L)))
    val explodedDim = dim.withColumn("__salt",
      explode(when(isHot, sequence(lit(0L), lit(factor - 1L)))
        .otherwise(array(lit(0L)))))
    val (fl, dl) = partitions match {
      case Some(n) => (salted.repartition(n, col(key), col("__salt")),
        explodedDim.repartition(n, col(key), col("__salt")))
      case None => (salted, explodedDim)
    }
    fl.join(dl, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
