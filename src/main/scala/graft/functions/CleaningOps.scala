package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level cleaning expressions — the single source of
  * truth that collapses the reference's duplicated batch/stream
  * cleaning projections (`IngestHistoricTrips.py:71-97` vs
  * `StreamingTaxiTrips.py:94-120`, SURVEY.md §2.2 P1/P2).
  *
  * Everything here is a built-in Catalyst expression (no UDFs), so the
  * whole cleaning stage stays inside WholeStageCodegen at any scale.
  */
object CleaningOps {

  /** P3/F1 — currency string like "$1,234.56" → double.
    * Exact reference semantics: `regexp_replace(col,'[\$,)]','')` then
    * cast (`IngestHistoricTrips.py:82-86`). `try_cast` because the
    * reference ran pre-ANSI Spark, where an unparseable string casts
    * to null instead of failing the job — the permissive behavior IS
    * the cleaning contract ("strings first, cast later"). */
  def parseCurrency(c: Column): Column =
    translate(c, "$,)", "").try_cast("double")

  /** The literal reference expression (regexp_replace) — semantically
    * identical to the translate-based parseCurrency above (both strip
    * the characters $ , ) anywhere in the string); translate is
    * codegen'd as a char-map loop with no regex engine, so it is the
    * production spelling. Kept for documentation and the parity spec. */
  def parseCurrencyRegex(c: Column): Column =
    regexp_replace(c, "[\\$,)]", "").try_cast("double")

  /** P4 — the reference's deliberately lossy miles cast: declared
    * double, stored int (`IngestHistoricTrips.py:77`). 0.6 mi → 0.
    * try_cast: on the STREAM path miles arrive as strings and "3.2"
    * does not parse as int → null (pre-ANSI cast semantics, which the
    * reference relies on). */
  def lossyIntCast(c: Column): Column = c.try_cast("int")

  /** A7 — day-truncation key, byte-compatible with
    * `to_timestamp(date_format(ts,'yyyy-MM-dd 00:00:00'))`
    * (`TransformTaxiTrips.py:47`); expressed as date_trunc so Catalyst
    * can fold it. */
  def dayTrunc(ts: Column): Column = date_trunc("day", ts)

  /** F2 — partition-column derivation (`IngestHistoricTrips.py:95-96`). */
  def yearCol(ts: Column): Column = year(ts)
  def monthCol(ts: Column): Column = month(ts)
}
