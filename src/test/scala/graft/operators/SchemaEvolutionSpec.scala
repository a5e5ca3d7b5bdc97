package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The schema-evolution contract: the unified read presents ONE
  * stable current schema over three writer generations — added
  * columns null before their add, dropped columns null after their
  * drop, renames surfacing old physical bytes under new names — and
  * unification costs metadata only (no joins, no shuffles beyond the
  * consumer's own). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val SE = SchemaEvolution

  test("unified read: one stable schema; per-generation null contract holds") {
    withIndexRoot("graft-sev-spec") {
      val u = SE.readUnified(spark, sf)
      assert(u.columns.toSeq === Seq("event_id", "ts", "user_id", "event_type",
        "value", "attributes", "channel", "score", "gen"))
      val byGen = u.groupBy($"gen")
        .agg(count(lit(1)).as("n"),
          count($"channel").as("ch"),
          count($"score").as("sc"),
          count($"attributes").as("at"))
        .collect().map(r => r.getInt(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val (n0, ch0, sc0, at0) = byGen(0)
      val (n1, ch1, sc1, at1) = byGen(1)
      val (n2, ch2, sc2, at2) = byGen(2)
      assert(n0 > 0 && n1 > 0 && n2 > 0, "every generation must have rows")
      // gen 0: neither added column exists yet; props carried through
      assert(ch0 === 0L && sc0 === 0L && at0 === n0)
      // gen 1: channel added, score not yet, props still written
      assert(ch1 === n1 && sc1 === 0L && at1 === n1)
      // gen 2: both added, props dropped by the writer
      assert(ch2 === n2 && sc2 === n2 && at2 === 0L)
    }
  }

  test("rename mapping surfaces old files' props bytes under the new name") {
    withIndexRoot("graft-sev-spec") {
      val u = SE.readUnified(spark, sf)
      val ev = graft.Tables(spark, sf, "events")
      val old = u.where($"gen" < 2).select($"event_id", $"attributes")
      val joined = old.join(ev.select($"event_id", $"props"), Seq("event_id"))
      assert(joined.where($"attributes" =!= $"props" ||
        $"attributes".isNull =!= $"props".isNull).count() === 0L,
        "attributes must be exactly the stored props for pre-drop files")
    }
  }

  test("unified row set equals the source table; no rows lost or invented") {
    withIndexRoot("graft-sev-spec") {
      val u = SE.readUnified(spark, sf)
      val ev = graft.Tables(spark, sf, "events")
      assert(u.count() === ev.count())
      val a = u.select("event_id").collect().map(_.getLong(0)).sorted
      val b = ev.select("event_id").collect().map(_.getLong(0)).sorted
      assert(a.toSeq === b.toSeq)
    }
  }

  test("filters on an added column stay correct across pre-add files") {
    withIndexRoot("graft-sev-spec") {
      val u = SE.readUnified(spark, sf)
      // pre-add rows have channel NULL — a channel predicate must
      // exclude them (SQL null semantics), never error or leak
      val got = u.where($"channel" === "ch1").count()
      val ev = graft.Tables(spark, sf, "events")
      val expect = ev.where(
        col("ts") >= lit(MinMaxManifest.utc(SE.Gen1Start)) &&
          col("user_id") % 3 === 1).count()
      assert(got === expect)
    }
  }

  test("unification is metadata-only: no join/window in the unified plan") {
    withIndexRoot("graft-sev-spec") {
      val p = SE.readUnified(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("Join") && !p.contains("Window"),
        s"schema union must not plan data-combining operators:\n$p")
    }
  }
}
