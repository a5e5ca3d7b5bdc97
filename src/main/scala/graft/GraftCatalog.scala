package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface entry point (reference requirement 4,
  * `/root/reference/README.md:12`: everything queryable from a
  * dashboard tool). Registers every testdata table as a temp view and
  * the engine's native SQL functions, so a JDBC/Thrift dashboard — or
  * plain `spark.sql` — can query the full surface without touching the
  * DataFrame API:
  *
  * {{{
  * GraftCatalog.registerAll(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT array_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * Views are lazy logical plans over the parquet scans — registering
  * costs nothing until queried, and Catalyst prunes/pushes down
  * through them exactly as through the DataFrame reads.
  */
object GraftCatalog {

  /** Register all testdata tables as temp views + native functions. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { name =>
      Tables(spark, sfDir, name).createOrReplaceTempView(name)
    }
    plans.GraftExtensions.register(spark)
  }

  /** Register the persisted ROLLUP layers as views too: the daily HLL
    * register table, the daily histogram table, and the file-stats
    * manifest — the dashboard-facing face of the scan-free operators,
    * so a SQL client can merge sketches or plan a pruned read without
    * the DataFrame API. NOTE: registration EAGERLY triggers each
    * layer's one-time build (ensure() runs here, not at first query) —
    * a cold host pays the three corpus scans up front, and every later
    * registration on the corpus is a metadata check. Dashboards that
    * must come up instantly should warm the artifacts out of band
    * first (the r7 advice: the previous scaladoc promised first-USE
    * laziness the code never had). */
  def registerRollups(spark: SparkSession, sfDir: String): Unit = {
    operators.SketchRollup.ensure(spark, sfDir)
    spark.read.parquet(operators.SketchRollup.sketchPath(sfDir))
      .createOrReplaceTempView("hll_daily")
    operators.HistogramRollup.ensure(spark, sfDir)
    spark.read.parquet(operators.HistogramRollup.histPath(sfDir))
      .createOrReplaceTempView("hist_daily")
    operators.MinMaxManifest.ensure(spark, sfDir)
    spark.read.parquet(operators.MinMaxManifest.manifestPath(sfDir))
      .createOrReplaceTempView("file_stats")
    // the round-10 layers: summable daily partials, KMV identity
    // sketches, decayed-feature partials, count-min grids
    operators.AggRollup.ensure(spark, sfDir)
    spark.read.parquet(operators.AggRollup.aggPath(sfDir))
      .createOrReplaceTempView("agg_daily")
    operators.KmvRollup.ensure(spark, sfDir)
    spark.read.parquet(operators.KmvRollup.sketchPath(sfDir))
      .createOrReplaceTempView("kmv_daily")
    operators.DecayedFeatures.ensure(spark, sfDir)
    spark.read.parquet(operators.DecayedFeatures.dailyPath(sfDir))
      .createOrReplaceTempView("feat_daily")
    operators.CmsRollup.ensure(spark, sfDir)
    spark.read.parquet(operators.CmsRollup.cmsPath(sfDir))
      .createOrReplaceTempView("cms_daily")
    // and the optimizer rewrite on top: a dashboard writing the PLAIN
    // raw aggregate over `events` (count / sum(floor(value)) /
    // day-grain timeseries over a day-aligned window) is served
    // scan-free by hist_daily/agg_daily — exactness-preserving, so
    // leaving it enabled is safe for every other SQL statement
    plans.RollupRouting.enable(spark)
  }
}
