package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The validation-suite contract: the whole suite compiles into ONE
  * scan of the table, metrics are exact, failing constraints actually
  * fail, and the referential-integrity leg finds planted orphans. */
class ConstraintCheckSpec extends SparkSpec {
  import spark.implicits._

  private val CC = ConstraintCheck

  private def sample = Seq(
    (1L, "a", 10.0, Some("x")),
    (2L, "b", 20.0, Some("y")),
    (3L, "a", -5.0, None),
    (4L, "c", 30.0, Some("z")),
    (4L, "a", 40.0, Some("w")) // duplicate id
  ).toDF("id", "cat", "v", "tag")

  test("metrics are exact and failing constraints fail") {
    val report = CC.run(sample, Seq(
      CC.Constraint("complete", "tag", CC.completeness("tag"), _ >= 1.0),
      CC.Constraint("unique", "id", CC.uniqueness("id"), _ >= 1.0),
      CC.Constraint("domain", "cat", CC.containedIn("cat", Seq("a", "b")), _ >= 1.0),
      CC.Constraint("range", "v", CC.inRange("v", 0, 100), _ >= 1.0),
      CC.Constraint("size", "rows", count(lit(1)).cast("double"), _ >= 3.0)))
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(report(("complete", "tag")) === ((0.8, 0L)))
    assert(report(("unique", "id")) === ((0.8, 0L)))
    assert(report(("domain", "cat")) === ((0.8, 0L)))
    assert(report(("range", "v")) === ((0.8, 0L)))
    assert(report(("size", "rows")) === ((5.0, 1L)))
  }

  test("the whole suite is one scan of the table") {
    val report = CC.run(sample, Seq(
      CC.Constraint("complete", "tag", CC.completeness("tag"), _ >= 1.0),
      CC.Constraint("range", "v", CC.inRange("v", 0, 100), _ >= 1.0),
      CC.Constraint("size", "rows", count(lit(1)).cast("double"), _ >= 3.0)))
    val p = report.queryExecution.executedPlan.toString
    // a local relation renders as one LocalTableScan; k constraints
    // must not multiply it (no self-union of per-constraint scans)
    assert("LocalTableScan".r.findAllIn(p).size === 1,
      s"suite must compile to a single scan:\n$p")
    assert(!p.contains("Join") && !p.contains("Union"),
      s"no per-constraint recombination allowed:\n$p")
  }

  test("referential integrity finds planted orphans and passes when clean") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val clean = Seq(1L, 1L, 2L).toDF("fk")
    val dirty = Seq(1L, 9L, 8L).toDF("fk")
    val ok = CC.referentialIntegrity(clean, "fk", parent, "pk", "ri").head()
    assert(ok.getDouble(2) === 0.0 && ok.getLong(3) === 1L)
    val bad = CC.referentialIntegrity(dirty, "fk", parent, "pk", "ri").head()
    assert(bad.getDouble(2) === 2.0 && bad.getLong(3) === 0L)
  }

  test("referential integrity works with SAME-NAMED key columns") {
    // the surrogate-key norm: both sides call the key "id" — an
    // unqualified col("id") join would be AMBIGUOUS_REFERENCE
    val parent = Seq(1L, 2L).toDF("id")
    val child = Seq(1L, 7L).toDF("id")
    val r = CC.referentialIntegrity(child, "id", parent, "id", "ri").head()
    assert(r.getDouble(2) === 1.0 && r.getLong(3) === 0L)
  }

  test("q35 report: every check appears once; the planted failure is user_id uniqueness") {
    val df = graft.queries.RelationalQueries.q35QualityChecks
      .fn(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length === 8)
    val failed = rows.filter(_._4 == 0L).map(r => (r._1, r._2)).toSet
    // at sf0.001 the size gate (>= 5000) also fails — 1000 events
    assert(failed === Set(("unique", "user_id"), ("size", "events")),
      s"unexpected failure set: $failed")
    val ri = rows.find(_._1 == "ri_orphans").get
    assert(ri._3 === 0.0 && ri._4 === 1L, "TPC-H RI must hold")
  }
}
