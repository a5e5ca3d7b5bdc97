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

  test("governed time travel: purges invisible at EVERY snapshot, identity schema-absent") {
    // the erasure-vs-time-travel tension (q41): snapshot 0 was minted
    // BEFORE the purge, yet a purged identity must be invisible there
    // too — and the policy must drop the raw key from the schema, not
    // just hide rows
    withIndexRoot("graft-gtt-spec") {
      import org.apache.spark.sql.functions._
      val M = MinMaxManifest
      val DV = DeletionVectors
      val ev = graft.Tables(spark, sf, "events")
      val (b1, b2) = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")
      M.ensureHistory(spark, sf, "events_tt",
        ev.where(col("ts") < lit(M.utc(b1))),
        Seq(ev.where(col("ts") >= lit(M.utc(b1)) && col("ts") < lit(M.utc(b2))),
          ev.where(col("ts") >= lit(M.utc(b2)))))
      DV.ensure(spark, sf)
      if (!DV.eqDeletesRecorded(sf))
        DV.deleteKeys(spark, sf,
          ev.select(col("user_id")).where(col("user_id") % 97 === 0))
      val erased = DV.erasedKeys(spark, sf)
      assert(erased.count() > 0, "the fixture must purge someone")
      val policy = G.Policy("auditor", col("event_type") =!= "error",
        masks = Map("user_sha" -> md5(col("user_id").cast("string").cast("binary"))),
        dropCols = Seq("user_id", "props"))
      (0L to 2L).foreach { snap =>
        val (f, _, _) = M.asOfEvents(spark, sf, snap,
          "1970-01-01 00:00:00", "2200-01-01 00:00:00", "events_tt")
        val gov = G.governed(f.join(erased, Seq("user_id"), "left_anti"), policy)
        assert(!gov.columns.contains("user_id") && !gov.columns.contains("props"),
          s"snapshot $snap must not expose the raw identity columns")
        // a purged user's digest never appears — checked by VALUE
        val purgedShas = erased
          .select(md5(col("user_id").cast("string").cast("binary")).as("s"))
        assert(gov.join(purgedShas, gov("user_sha") === purgedShas("s"))
            .count() === 0L,
          s"snapshot $snap leaked a purged identity")
        assert(gov.where(lit(true)).count() > 0, s"snapshot $snap must not be empty")
      }
    }
  }
}
