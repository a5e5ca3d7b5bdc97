package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** LEFT AS-OF join — the temporal operator Spark has no native join
  * type for (reference analog: point-in-time enrichment; DuckDB has it
  * as `ASOF LEFT JOIN`): for each fact row, the NEWEST dim row with
  * `dim.ts <= fact.ts` on the same key, delivered as one struct.
  *
  * Implementation is the scalable union+window formulation: tag both
  * sides, union, ONE shuffle on the key, per-key time-ordered window
  * carrying the last non-null dim payload forward. Dim rows sort
  * before fact rows at equal timestamps, so the match is inclusive —
  * exactly DuckDB's semantics. At scale this beats a range-join: no
  * candidate-interval explosion, and state during the window scan is
  * one row per partition.
  *
  * The dim payload travels as ONE struct so every as-of field comes
  * from the SAME dim row: per-column `last(..., ignoreNulls)` calls
  * would each skip nulls independently — a newest dim row with a null
  * field would pair its other fields with an OLDER row's value (a
  * torn row a true as-of join never produces). Fact rows carry a null
  * STRUCT (skipped as a unit); a dim row's struct is never null even
  * when every field inside it is.
  *
  * Null-key caveat: window partitioning groups null keys TOGETHER
  * (unlike a join, where null never equals null) — filter or coalesce
  * a nullable key first.
  *
  * @param fact        left side; all columns are preserved
  * @param dim         right side; every column except `key` is
  *                    delivered inside the `asof` struct (including
  *                    `ts`, so callers can compute staleness)
  * @param key         equi-join column name, present on both sides
  * @param ts          event-time column name, present on both sides
  * @param dimTieBreak dim column ordering same-(key, ts) dim rows
  *                    deterministically (e.g. a unique event id);
  *                    the LARGEST wins, matching "newest row"
  * @return fact columns + `asof` struct (null when no dim row at or
  *         before the fact's timestamp)
  */
object AsOfJoin {
  def leftAsOf(fact: DataFrame, dim: DataFrame, key: String, ts: String,
      dimTieBreak: String): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    // the output appends `asof`, and the union plan carries internal
    // tag columns — a fact column with one of these names would emit a
    // duplicate/ambiguous column downstream, so fail at plan time with
    // a named error instead of a later AMBIGUOUS_REFERENCE
    val reserved = Seq("asof", "__k", "__t", "__isdim", "__ord", "__fact")
    val clash = fact.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"leftAsOf: fact columns ${clash.mkString(", ")} collide with " +
        s"reserved output/internal names (${reserved.mkString(", ")}); " +
        "rename them before joining")
    val payloadCols = dim.columns.filterNot(_ == key).toSeq
    val payloadType = StructType(payloadCols.map(c => dim.schema(c)))
    val factType = StructType(fact.schema.fields)
    val ordType = dim.schema(dimTieBreak).dataType
    val f = fact.select(
      col(key).as("__k"), col(ts).as("__t"),
      lit(null).cast(payloadType).as("asof"),
      lit(0).as("__isdim"),
      lit(null).cast(ordType).as("__ord"),
      struct(fact.columns.map(col).toSeq: _*).as("__fact"))
    val d = dim.select(
      col(key).as("__k"), col(ts).as("__t"),
      struct(payloadCols.map(col): _*).as("asof"),
      lit(1).as("__isdim"),
      col(dimTieBreak).as("__ord"),
      lit(null).cast(factType).as("__fact"))
    val w = Window.partitionBy($"__k")
      .orderBy($"__t".asc, $"__isdim".desc, $"__ord".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.unionByName(d)
      .select($"__fact", $"__isdim",
        last($"asof", ignoreNulls = true).over(w).as("asof"))
      .where($"__isdim" === 0)
      .select($"__fact.*", $"asof")
  }
}
