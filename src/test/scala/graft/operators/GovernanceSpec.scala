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

  test("the lineage publish gate refuses raw-path taint at plan time; the governed view's own products pass") {
    val p = G.analystPolicy
    // a hand-built exfiltration over the RAW table: identical VALUES
    // to the sanctioned digest, but its provenance is the raw text
    // column — refused before anything executes
    val exfil = docs.select(col("source"),
      md5(col("text").cast("binary")).as("looks_sanctioned"))
    val e = intercept[IllegalArgumentException] {
      G.assertPublishable(exfil, p)
    }
    assert(e.getMessage.contains("looks_sanctioned") &&
      e.getMessage.contains("analyst"),
      s"the refusal must name the tainted column and principal: ${e.getMessage}")
    // sneakier: text laundered through a join + aggregate still taints
    val laundered = docs.select(col("doc_id"), length(col("text")).as("tl"))
      .groupBy(col("doc_id")).agg(max(col("tl")).as("m"))
    intercept[IllegalArgumentException] { G.assertPublishable(laundered, p) }
    // the sanctioned path: anything derived from the governed view's
    // outputs — including the declassified digest — publishes, and
    // the gate returns the frame for chaining
    val fromView = G.analystDocuments(spark, sf)
      .groupBy(col("text_sha")).agg(count(lit(1)).as("n"))
    assert(G.assertPublishable(fromView, p) eq fromView)
    // and lineage still AUDITS the declassification honestly: the
    // digest column's source is the labeled mask, never invisible
    val srcs = graft.plans.ColumnLineage.sources(
      G.analystDocuments(spark, sf))("text_sha")
    assert(srcs === Set("mask[analyst].text_sha"),
      s"declassified lineage must carry the mask label: $srcs")
    // untainted raw-side columns publish fine (the gate is per-column)
    val clean = docs.select(col("doc_id"), col("source"))
    assert(G.assertPublishable(clean, p) eq clean)
  }

  test("kAnonymize: every released group has >= k rows and mass is conserved") {
    val ev = graft.Tables(spark, sf, "events")
    val total = ev.count()
    // spec k sized to the sf0.001 fixture so BOTH rungs fire (the
    // registered query's k=35 is sized for sf0.01+, where day groups
    // are big enough to release at rung 0)
    val k = 8L
    val levels = Seq(
      G.QiLevel(0, Seq(
        "qi_type" -> col("event_type"),
        "qi_time" -> to_date(col("ts")).cast("string"),
        "qi_band" -> floor(col("value") / 100).cast("long"))),
      G.QiLevel(1, Seq(
        "qi_type" -> col("event_type"),
        "qi_time" -> substring(to_date(col("ts")).cast("string"), 1, 7),
        "qi_band" -> floor(col("value") / 100).cast("long"))))
    val rel = G.kAnonymize(ev, levels, k).collect()
    val released = rel.filter(_.getInt(0) <= 1)
    val suppressed = rel.filter(_.getInt(0) == 2)
    assert(suppressed.length === 1, "exactly one suppressed-total row")
    released.foreach(r => assert(r.getLong(4) >= k,
      s"released group under k: $r"))
    assert(released.map(_.getLong(4)).sum + suppressed.head.getLong(4) === total,
      "released mass + suppressed mass must equal the table")
    // the ladder must actually fire on this data: some rows release
    // at the coarser rung (otherwise the generalization is untested)
    assert(released.exists(_.getInt(0) == 1),
      "the month rung must release at least one group at this SF")
    // stranded-only counting (the differencing-leak guard): a rung-1
    // group's size must equal the stranded-row count under its key —
    // NOT the all-rows count, which would include rung-0-released
    // rows and leak their finer split by subtraction
    val allAtMonth = ev.select(col("event_type").as("qi_type"),
        substring(to_date(col("ts")).cast("string"), 1, 7).as("qi_time"),
        floor(col("value") / 100).cast("long").cast("string").as("qi_band"))
      .groupBy("qi_type", "qi_time", "qi_band")
      .agg(count(lit(1)).as("all_n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val rung1Overcount = released.filter(_.getInt(0) == 1).exists { r =>
      val key = (r.getString(1), r.getString(2), r.getString(3))
      allAtMonth.get(key).exists(_ > r.getLong(4))
    }
    assert(rung1Overcount,
      "at least one rung-1 group must be smaller than its all-rows " +
        "month count (proof the count excluded rung-0-released rows)")
  }
}
