package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ-shape contract
  * (AWS's published constraint-verification pattern, reduced to its
  * Spark-expressible core): a suite of named constraints over a
  * table compiles into ONE aggregation pass, and the result is a
  * small report frame (check, column, metric, passed) instead of a
  * boolean — pipelines gate on `passed`, humans read `metric`.
  *
  * Why one pass matters at 100 TB: each constraint alone is a full
  * scan; naively checking k constraints costs k scans. Compiling the
  * suite into a single multi-aggregate means the corpus is read ONCE
  * whatever the suite size — the metrics all reduce to one row, and
  * the report explodes back out of that row without touching data
  * again (the explode is over a k-element literal array). A
  * countDistinct in the suite adds Spark's standard expand-plan leg,
  * still within the same scan. Cross-TABLE constraints (referential
  * integrity) are the exception — they are genuine joins and run as
  * their own job, reduced to a count.
  *
  * The report deliberately includes FAILING checks — a validation
  * suite whose fixtures only ever pass is indistinguishable from one
  * that checks nothing. */
object ConstraintCheck {

  /** One constraint: a metric aggregate over the table and a pass
    * predicate over the resulting metric value. */
  final case class Constraint(
      check: String, column: String,
      metric: Column, pass: Column => Column)

  /** Fraction of non-null values (Deequ isComplete / hasCompleteness). */
  def completeness(c: String): Column =
    count(col(c)).cast("double") / count(lit(1))

  /** Distinct ratio (== 1.0 ⇔ unique key). */
  def uniqueness(c: String): Column =
    countDistinct(col(c)).cast("double") / count(lit(1))

  /** Fraction of values inside an allowed set. */
  def containedIn(c: String, allowed: Seq[String]): Column =
    count(when(col(c).isin(allowed: _*), 1)).cast("double") / count(lit(1))

  /** Fraction of values inside [lo, hi). */
  def inRange(c: String, lo: Double, hi: Double): Column =
    count(when(col(c) >= lo && col(c) < hi, 1)).cast("double") / count(lit(1))

  /** Compile the suite into one aggregation pass and explode the
    * report back out of the single metrics row. */
  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    val aggs = constraints.zipWithIndex.map { case (m, i) =>
      m.metric.cast("double").as(s"_m$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = constraints.zipWithIndex.map { case (m, i) =>
      struct(
        lit(m.check).as("check"),
        lit(m.column).as("col"),
        round(col(s"_m$i"), 6).as("metric"),
        m.pass(col(s"_m$i")).cast("long").as("passed"))
    }
    row.select(explode(array(structs: _*)).as("r")).select("r.*")
  }

  /** Cross-table referential integrity: the count of child keys with
    * no parent (anti-join, reduced to one number), reported in the
    * same report shape. The child side streams; the parent key set
    * arrives via the join strategy Catalyst picks for its size. */
  def referentialIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, check: String): DataFrame = {
    // both sides rename to private keys before the join: with
    // same-named child/parent key columns (the surrogate-key norm),
    // unqualified col(key) would be AMBIGUOUS_REFERENCE (review catch)
    val orphans = child.select(col(childKey).as("_ck"))
      .join(parent.select(col(parentKey).as("_pk")),
        col("_ck") === col("_pk"), "left_anti")
      .agg(count(lit(1)).cast("double").as("_m"))
    orphans.select(
      lit(check).as("check"),
      lit(childKey).as("col"),
      round(col("_m"), 6).as("metric"),
      (col("_m") === 0.0).cast("long").as("passed"))
  }
}
