package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All capabilities register in [[QueryRegistry]]; this object is just
  * the harness-facing façade. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q04 star join: shuffled fact–fact join + broadcast dim chain + agg. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.RelationalQueries.q04StarJoin.fn(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.asMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracles
}
