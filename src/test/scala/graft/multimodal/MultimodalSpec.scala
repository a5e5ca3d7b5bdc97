package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRow(id, MediaMeta(kind, "raw", 0, 0, 0, 0), bytes)

  test("stubDecode is deterministic and L1-normalized") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val f1 = stubDecode(payload)
    val f2 = stubDecode(payload)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("extractFeatures: partition-batch decode preserves ids and kinds") {
    val ds = Seq(
      media(1, "image", "hello world".getBytes),
      media(2, "audio", Array.fill[Byte](256)(7)),
      media(3, "image", Array.empty[Byte])).toDS()
    val out = extractFeatures(ds).collect().sortBy(_.mediaId)
    assert(out.map(_.mediaId).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.kind).toSeq === Seq("image", "audio", "image"))
    assert(out.forall(_.features.length === 16))
    // constant payload 7 → all mass in bin 0 (7 >>> 4 == 0)
    assert(out(1).features(0) === 1.0f)
    // empty payload → zero vector, no NaNs
    assert(out(2).features.forall(f => f === 0.0f && !f.isNaN))
  }

  test("sampleFrames: N contiguous slices reassemble the payload") {
    val payload = Array.tabulate[Byte](103)(_.toByte) // deliberately not divisible
    val frames = sampleFrames(Seq(media(9, "video", payload)).toDS(), 4)
      .collect().sortBy(_.frameIdx)
    assert(frames.length === 4)
    assert(frames.map(_.payload.length).sum === 103)
    assert(frames.flatMap(_.payload).toSeq === payload.toSeq)
    // empty payload emits no frames
    assert(sampleFrames(Seq(media(10, "video", Array.empty[Byte])).toDS(), 4)
      .count() === 0)
  }

  test("resizeTo: payload truncated/padded and metadata updated") {
    val out = resizeTo(Seq(media(5, "image", Array[Byte](1, 2, 3))).toDS(),
      targetBytes = 8, targetW = 64, targetH = 64).head()
    assert(out.payload.toSeq === Seq[Byte](1, 2, 3, 0, 0, 0, 0, 0))
    assert(out.meta.width === 64 && out.meta.height === 64)
    assert(out.meta.kind === "image")
  }

  test("m05 chunk store: every document reassembles byte-identically") {
    val df = graft.queries.MultimodalQueries.m05ChunkStore
      .fn(spark, "/root/testdata/sf0.001")
    val rows = df.select("kind", "n_docs", "n_ok", "total_chunks",
      "uniq_chunks").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"kind ${r.getString(0)}: ${r.getLong(1)} docs but only " +
          s"${r.getLong(2)} round-tripped")
      assert(r.getLong(4) <= r.getLong(3)) // store never grows the corpus
    }
  }
}
