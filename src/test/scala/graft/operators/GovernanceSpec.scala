package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The governance contract: the dropped column is schema-absent (the
  * strongest "no"), the row policy leaks nothing, the mask is the
  * exact digest of the hidden content, and governance costs nothing
  * at plan time — the principal's own predicates still push to the
  * scan and no data-combining operator appears. */
class GovernanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val G = Governance

  private def docs = graft.Tables(spark, sf, "documents")
  private def restricted = substring(col("source"), 4, 10).cast("int") % 4 === 0

  test("raw text is schema-absent; selecting it fails at analysis") {
    val g = G.analystDocuments(spark, sf)
    assert(!g.columns.contains("text"))
    assert(g.columns.contains("text_sha"))
    intercept[org.apache.spark.sql.AnalysisException] {
      g.select("text").collect()
    }
  }

  test("the row policy leaks no restricted row and drops no allowed row") {
    val g = G.analystDocuments(spark, sf)
    val gIds = g.select("doc_id").collect().map(_.getLong(0)).toSet
    val allowed = docs.where(!restricted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gIds === allowed)
    assert(docs.where(restricted).count() > 0,
      "the fixture must actually restrict something")
  }

  test("the mask is the exact digest of the hidden content") {
    val g = G.analystDocuments(spark, sf).select("doc_id", "text_sha")
    val joined = g.join(
      docs.select(col("doc_id"), md5(col("text").cast("binary")).as("expect")),
      Seq("doc_id"))
    assert(joined.where(col("text_sha") =!= col("expect")).count() === 0L)
  }

  test("governance is plan-free: predicates push through, no join/window/shuffle") {
    val q = G.analystDocuments(spark, sf).where(col("lang") === "en")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("lang"),
      s"the principal's own predicate must reach the scan:\n$p")
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("Exchange"),
      s"a governed view is a projection+filter, nothing more:\n$p")
  }

  test("the catalog view serves the same governed frame through plain SQL") {
    G.registerAnalystView(spark, sf)
    val viaSql = spark.sql(
      "SELECT count(*) FROM documents_analyst").head().getLong(0)
    assert(viaSql === docs.where(!restricted).count())
  }
}
