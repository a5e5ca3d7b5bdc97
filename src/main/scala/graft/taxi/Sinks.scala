package graft.taxi

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Pluggable batch view sink — the reference writes its 4 aggregate
  * views straight to PostgreSQL (`TransformTaxiTrips.py:115-119` etc.,
  * SURVEY.md §2.1 S9); tests need parquet/memory targets, so the JDBC
  * coupling lives behind this trait. */
trait ViewSink {
  def write(df: DataFrame, table: String): Unit
}

/** S9 — JDBC sink, `mode=overwrite` per-year tables (drops/recreates
  * the table like the reference). One JDBC connection per partition at
  * write time; callers should `coalesce` small aggregate views to
  * bound connection count. `columnTypes` optionally overrides DDL
  * column types (e.g. VARCHAR(n) where a dialect would default string
  * columns to CLOB/TEXT and break filter pushdown on read-back). */
final class JdbcSink(url: String, props: java.util.Properties,
    columnTypes: Map[String, String] = Map.empty) extends ViewSink {
  def write(df: DataFrame, table: String): Unit = {
    val w = df.write.mode("overwrite")
    val typed =
      if (columnTypes.isEmpty) w
      else {
        val present = columnTypes.filter { case (c, _) => df.columns.contains(c) }
        if (present.isEmpty) w
        else w.option("createTableColumnTypes",
          present.map { case (c, t) => s"$c $t" }.mkString(", "))
      }
    typed.jdbc(url, table, props)
  }
}

/** Parquet sink for local runs/tests — same overwrite semantics. */
final class ParquetSink(baseDir: String) extends ViewSink {
  def write(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$baseDir/$table")
}

/** ORC sink — the columnar alternative where the warehouse reads ORC
  * (Hive-first estates). Same overwrite semantics; ORC carries
  * min/max/bloom indexes per stripe, so read-back predicate pushdown
  * works like parquet's (spec-pinned). */
final class OrcSink(baseDir: String) extends ViewSink {
  def write(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").orc(s"$baseDir/$table")
}

/** In-memory sink for assertions in specs. */
final class MemorySink extends ViewSink {
  val tables: mutable.Map[String, DataFrame] = mutable.Map.empty
  def write(df: DataFrame, table: String): Unit = {
    // materialize eagerly so test assertions see a stable snapshot
    val cached = df.cache()
    cached.count()
    tables(table) = cached
  }
}
