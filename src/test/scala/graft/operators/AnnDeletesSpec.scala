package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The vector-tombstone contract: deleted ids never surface in
  * results, batches replay idempotently and accumulate, and
  * consumers that don't opt into the boundary (v04) are untouched. */
class AnnDeletesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val AD = AnnDeletes

  test("tombstoned vectors never surface; other consumers untouched") {
    withIndexRoot("graft-annd-spec") {
      val v17 = graft.queries.VectorQueries.v17AnnDeletes
        .fn(spark, sf).collect()
      assert(v17.nonEmpty)
      v17.foreach { r =>
        assert(r.getLong(2) % 23 != 3,
          s"tombstoned neighbor ${r.getLong(2)} surfaced")
      }
      // v04 (no deletion boundary) still returns everything —
      // tombstones apply only where a consumer opts in
      val v04 = graft.queries.VectorQueries.v04IvfAnn
        .fn(spark, sf).collect()
      assert(v04.exists(r => r.getLong(2) % 23 == 3),
        "the baseline search must still see the vectors the fixture deletes")
    }
  }

  test("every ANN path honors tombstones when opted in; non-opted twins untouched") {
    withIndexRoot("graft-annd-paths") {
      // the r7 verdict's v17 gap: IVFADC / PQ / Hamming candidate
      // stages could still return an erased vector — each opted leg
      // must drop them, and the non-opted twins (v10/v12/v16) must be
      // BIT-IDENTICAL before and after the tombstones land
      val VQ = graft.queries.VectorQueries
      val nonOpted = Seq("v10_pq_adc_knn" -> VQ.v10PqAdcKnn,
        "v12_ivfadc_knn" -> VQ.v12IvfAdcKnn,
        "v16_hamming_ann" -> VQ.v16HammingAnn)
      def snap() = nonOpted.map { case (n, gq) =>
        n -> gq.fn(spark, sf).collect().map(_.toString).toSeq
      }
      val before = snap()
      Seq("v18_ivfadc_deletes" -> VQ.v18IvfAdcDeletes,
          "v19_hamming_deletes" -> VQ.v19HammingDeletes,
          "v20_pq_deletes" -> VQ.v20PqDeletes).foreach {
        case (name, gq) =>
          val rows = gq.fn(spark, sf).collect()
          assert(rows.nonEmpty, s"$name returned nothing")
          rows.foreach(r => assert(r.getLong(2) % 23 != 3,
            s"$name surfaced tombstoned neighbor ${r.getLong(2)}"))
      }
      snap().zip(before).foreach { case ((n, after), (_, b)) =>
        assert(after === b,
          s"$n (non-opted) must be untouched by recorded tombstones")
      }
    }
  }

  test("batches replay idempotently and accumulate across tags") {
    withIndexRoot("graft-annd-spec") {
      val a = Seq(1L, 2L).toDF("vec_id")
      val b = Seq(3L, 4L).toDF("vec_id")
      AD.deleteVectors(spark, sf, a, "b1")
      AD.deleteVectors(spark, sf, a, "b1") // replay — no change
      AD.deleteVectors(spark, sf, b, "b2") // second batch — adds
      val got = AD.tombstones(spark, sf)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L))
    }
  }

  test("no tombstones recorded: the boundary is a no-op") {
    withIndexRoot("graft-annd-spec") {
      val cands = Seq((0L, 10L, 0.5), (0L, 11L, 0.4))
        .toDF("query_id", "vec_id", "sim")
      val out = AD.filterDeleted(spark, sf, cands)
        .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(out === Seq(10L, 11L))
    }
  }
}
