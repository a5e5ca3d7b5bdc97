package graft.queries

import graft.{GraftQuery, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators registered against the harness
  * (SURVEY.md §2.9 / north star). No real media testdata exists, so
  * the binary payloads are the documents' UTF-8 bytes — a genuine
  * opaque binary column exercising the same plumbing (binary schema,
  * typed Dataset boundary, partition-batch decode, 1:N frame fan-out)
  * that image/audio blobs would. The codec itself is the documented
  * deterministic stub in [[Multimodal.stubDecode]].
  */
object MultimodalQueries {
  private type QFn = (SparkSession, String) => DataFrame

  /** m01 — partition-batch feature extraction over a binary column:
    * documents → MediaRow(binary payload) → mapPartitions featurize →
    * per-kind aggregate of the feature vectors. The stub featurizer is
    * a 16-bin high-nibble byte histogram (float32-normalized), and the
    * testdata text is pure ASCII, so the DuckDB oracle reproduces it
    * from character codes; float32 division is safely emulated via
    * double division + cast (53 ≥ 2·24+2, so no double-rounding
    * hazard). The spec additionally pins determinism and batch
    * shape. */
  val m01BinaryFeatures: GraftQuery = GraftQuery(
    "m01_binary_features",
    (s, dir) => {
      import s.implicits._
      val media = Multimodal.asMedia(
        Tables(s, dir, "documents").select(
          $"doc_id".as("mediaId"),
          $"lang".as("kind"),
          lit("utf8").as("format"),
          $"text".cast("binary").as("payload")),
        nPartitions = 8)
      val feats = Multimodal.extractFeatures(media)
      feats.toDF()
        .select($"mediaId", $"kind", posexplode($"features").as(Seq("bin", "weight")))
        .groupBy($"kind", $"bin")
        .agg(round(avg($"weight"), 6).as("avg_weight"),
          count(lit(1)).as("n"))
        .orderBy($"kind", $"bin")
    },
    Some("""WITH d AS (
      |  SELECT doc_id, lang, text, length(text) AS len FROM documents),
      |chars AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len + 1),
      |                i -> ascii(text[i]) // 16)) AS bin
      |  FROM d),
      |cnt AS (
      |  SELECT doc_id, bin, count(*) AS c FROM chars GROUP BY doc_id, bin),
      |grid AS (
      |  SELECT d.doc_id, d.lang, d.len, CAST(b.bin AS INT) AS bin
      |  FROM d CROSS JOIN (SELECT unnest(range(16)) AS bin) b),
      |w AS (
      |  SELECT g.lang, g.bin,
      |         CAST(CAST(coalesce(c.c, 0) AS DOUBLE)
      |              / CAST(greatest(g.len, 1) AS DOUBLE) AS FLOAT) AS weight
      |  FROM grid g LEFT JOIN cnt c ON g.doc_id = c.doc_id AND g.bin = c.bin)
      |SELECT lang AS kind, bin, round(avg(weight), 6) AS avg_weight,
      |       count(*) AS n
      |FROM w GROUP BY lang, bin
      |ORDER BY kind, bin""".stripMargin),
    "multimodal: binary column + mapPartitions batch featurize")

  /** m02 — 1:N frame sampling over binary payloads (video-style
    * fan-out), aggregated back to per-media frame stats. The evenly
    * spaced byte slices partition the payload, so the oracle checks
    * the fan-out contract exactly: nFrames frames per non-empty
    * payload, slice bytes summing back to the payload length. */
  val m02FrameSample: GraftQuery = GraftQuery(
    "m02_frame_sample",
    (s, dir) => {
      import s.implicits._
      val media = Multimodal.asMedia(
        Tables(s, dir, "documents").select(
          $"doc_id".as("mediaId"),
          lit("video").as("kind"),
          lit("raw").as("format"),
          $"text".cast("binary").as("payload")),
        nPartitions = 8)
      Multimodal.sampleFrames(media, nFrames = 4).toDF()
        .select($"mediaId", $"frameIdx", length($"payload").as("frame_bytes"))
        .groupBy($"mediaId")
        .agg(count(lit(1)).as("frames"), sum($"frame_bytes").as("total_bytes"))
        .orderBy($"mediaId")
    },
    Some("""SELECT CAST(doc_id AS BIGINT)               AS mediaId,
      |       CAST(4 AS BIGINT)                    AS frames,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
      |FROM documents
      |WHERE octet_length(encode(text)) > 0
      |ORDER BY mediaId""".stripMargin),
    "multimodal: deterministic frame sampling (1:N batch fan-out)")

  /** m03 — resize plumbing under the correctness gate: every payload
    * truncated-or-padded to a fixed byte budget with metadata updated,
    * then verified per kind by row count, exact output size, and a
    * byte-value checksum. Truncation keeps the first `target` bytes
    * and zero-pads short payloads, so over ASCII text the checksum is
    * the character-code sum of the first `target` chars — exactly
    * computable in the oracle. */
  val m03Resize: GraftQuery = GraftQuery(
    "m03_resize_checksum",
    (s, dir) => {
      import s.implicits._
      val target = 128
      val media = Multimodal.asMedia(
        Tables(s, dir, "documents").select(
          $"doc_id".as("mediaId"),
          $"lang".as("kind"),
          lit("utf8").as("format"),
          $"text".cast("binary").as("payload")),
        nPartitions = 8)
      Multimodal.resizeTo(media, target, targetW = 16, targetH = 8)
        .map { r =>
          var sum = 0L
          r.payload.foreach(b => sum += (b & 0xff))
          (r.mediaId, r.meta.kind, r.payload.length, sum)
        }
        .toDF("mediaId", "kind", "bytes", "checksum")
        .groupBy($"kind")
        .agg(
          count(lit(1)).as("media"),
          max($"bytes").as("max_bytes"),
          min($"bytes").as("min_bytes"),
          sum($"checksum").as("byte_sum"))
        .orderBy($"kind")
    },
    Some("""SELECT lang                                        AS kind,
      |       count(*)                                    AS media,
      |       128                                         AS max_bytes,
      |       128                                         AS min_bytes,
      |       CAST(sum(list_aggregate(list_transform(
      |              range(1, least(length(text), 128) + 1),
      |              i -> ascii(text[i])), 'sum')) AS BIGINT) AS byte_sum
      |FROM documents
      |GROUP BY lang
      |ORDER BY kind""".stripMargin),
    "multimodal: resize (truncate-or-pad) + metadata propagation")

  /** m04 — chunk-checksum dedup over the BINARY payload column (the
    * multimodal face of the dedup family): md5 the leading fixed-size
    * chunk of the opaque bytes, group, report shared-chunk clusters
    * per kind. This is how large-media corpora are deduped without
    * decoding — checksum fixed-size chunks (the whole-payload hash is
    * the copies=identical special case; content-defined chunking is
    * the rolling-hash refinement, whose plumbing t07 covers). The
    * payloads here are the documents' UTF-8 bytes, so the oracle md5s
    * the same leading bytes from the text column. */
  val m04PayloadDedup: GraftQuery = GraftQuery(
    "m04_payload_dedup",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id", $"lang".as("kind"),
          md5(substring($"text".cast("binary"), 1, 64)).as("chunk_sum"))
        .groupBy($"kind", $"chunk_sum")
        .agg(count(lit(1)).as("copies"), min($"doc_id").as("keeper"))
        .where($"copies" > 1)
        .orderBy($"kind", $"chunk_sum")
    },
    Some("""SELECT lang AS kind, md5(substr(text, 1, 64)) AS chunk_sum,
      |       count(*) AS copies,
      |       CAST(min(doc_id) AS BIGINT) AS keeper
      |FROM documents
      |GROUP BY kind, chunk_sum
      |HAVING count(*) > 1
      |ORDER BY kind, chunk_sum""".stripMargin),
    "multimodal chunk-checksum dedup: shared leading chunks per kind")

  val all: Seq[GraftQuery] = Seq(
    m01BinaryFeatures, m02FrameSample, m03Resize, m04PayloadDedup)
}
