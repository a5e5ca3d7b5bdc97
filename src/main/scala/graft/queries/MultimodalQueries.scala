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
    * per-kind aggregate of the feature vectors. Rows-only check
    * (the featurizer is engine-specific by design); the spec pins
    * determinism and batch shape. */
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
    None,
    "multimodal: binary column + mapPartitions batch featurize")

  /** m02 — 1:N frame sampling over binary payloads (video-style
    * fan-out), aggregated back to per-media frame stats. */
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
    None,
    "multimodal: deterministic frame sampling (1:N batch fan-out)")

  val all: Seq[GraftQuery] = Seq(m01BinaryFeatures, m02FrameSample)
}
