package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic salted split/sample hash shared by every
  * gate/split/sample/mix decision in the library (curation family
  * c01/c02/c06/c09 and the index-training samples of
  * [[graft.operators.IndexStore]]): the first 15 hex chars of
  * md5(col || ':' || salt) read as a non-negative 60-bit long.
  *
  * The same arithmetic exists in two renderings — a Spark [[Column]]
  * and a DuckDB SQL fragment — so a row's fate is a pure function of
  * (stable id, salt) on BOTH engines, independent of partitioning,
  * retries, and row order (the no-rand() discipline: `rand()` draws
  * per-task, so a retry or repartition changes the sample). Change
  * one rendering only in lockstep with the other.
  */
object DetHash {

  /** Spark rendering: 60-bit salted hash of `c` as a long column. */
  def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit(":" + salt))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of [[hash60]] over a SQL expression. */
  def hash60Sql(e: String, salt: String): String =
    s"CAST('0x' || substr(md5(CAST($e AS VARCHAR) || ':$salt'), 1, 15) AS BIGINT)"

  /** DuckDB rendering with a per-row SQL-expression salt (the CMS
    * depth rows: salt = `'cms' || r`). Lockstep partner of calling
    * [[hash60]] once per literal salt value on the Spark side. */
  def hash60SqlDyn(e: String, saltExpr: String): String =
    s"CAST('0x' || substr(md5(CAST($e AS VARCHAR) || ':' || $saltExpr), 1, 15) AS BIGINT)"
}
