package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9 / north star): treat
  * image/audio/video as opaque `binary` columns with typed metadata,
  * and run decode / feature-extract / frame-sample as PARTITION-BATCH
  * functions — the JVM analog of PySpark's `mapInPandas` (iterator of
  * batches in, iterator of batches out; here `Dataset.mapPartitions`
  * with case-class encoders, which is Spark's typed batch boundary).
  *
  * The actual codec step is a STUB by design — no image/audio
  * libraries exist in this environment — implemented as a
  * deterministic byte-statistics featurizer, clearly marked below.
  * Everything around it (schema, binary handling, batch shape,
  * partitioning, metadata propagation) is real and tested; swapping
  * `stubDecode` for a JNI/ImageIO decoder changes no plumbing.
  *
  * 100 TB notes: media rows are large (MBs) — the partitioning unit
  * must be rows-per-task, not bytes-per-split; callers repartition by
  * media_id before decode so one task never holds >N blobs, and the
  * featurizer streams the iterator (never materializes a partition).
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata (the schema a real
    * ingest would carry; `meta` mirrors image/audio essentials). */
  case class MediaMeta(
      kind: String,          // "image" | "audio" | "video"
      format: String,        // container/codec tag, e.g. "png", "wav"
      width: Int, height: Int,
      sampleRate: Int, durationMs: Int)
  case class MediaRow(mediaId: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(mediaId: Long, kind: String, features: Array[Float])
  case class Frame(mediaId: Long, frameIdx: Int, payload: Array[Byte])

  /** ======= STUB CODEC =======
    * Deterministic stand-in for a real decoder: a 16-bin byte-value
    * histogram, L1-normalized. A real implementation would decode
    * pixels/samples here; the signature and batch shape are the
    * production ones. */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >>> 4) += 1f
      i += 1
    }
    val n = math.max(1, payload.length).toFloat
    bins.map(_ / n)
  }

  /** Feature extraction over a typed media Dataset — partition-batch
    * iterator in/out (mapInPandas analog). The iterator is streamed:
    * constant memory per task regardless of partition size. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.mediaId, r.meta.kind, stubDecode(r.payload)))
    }
  }

  /** Frame sampling for "video" payloads: N evenly-spaced byte slices
    * (a real impl would seek keyframes; offsets/slicing are the real
    * plumbing). Emits multiple rows per input — the 1:N batch shape. */
  def sampleFrames(media: Dataset[MediaRow], nFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else (0 until nFrames).iterator.map { i =>
        val start = (len.toLong * i / nFrames).toInt
        val end = (len.toLong * (i + 1) / nFrames).toInt
        Frame(r.mediaId, i, java.util.Arrays.copyOfRange(r.payload, start, end))
      }
    }
  }

  /** "Resize" stub: truncate-or-zero-pad the payload to targetBytes
    * and update metadata — exercises metadata propagation through a
    * transform (a real impl would re-encode). */
  def resizeTo(media: Dataset[MediaRow], targetBytes: Int,
      targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val out = java.util.Arrays.copyOf(r.payload, targetBytes)
      r.copy(meta = r.meta.copy(width = targetW, height = targetH), payload = out)
    }
  }

  /** DataFrame-side entry: build a typed media Dataset from any frame
    * with (id long, kind string, payload binary) — e.g. documents.text
    * cast to binary in the registered demo query. Rows are
    * repartitioned by id so blob count per task is bounded. */
  def asMedia(df: DataFrame, nPartitions: Int): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.repartition(nPartitions, col("mediaId"))
      .select(col("mediaId").cast("long"),
        col("kind"), col("format"),
        col("payload").cast("binary"))
      .map { row =>
        MediaRow(row.getLong(0),
          MediaMeta(row.getString(1), row.getString(2), 0, 0, 0, 0),
          row.getAs[Array[Byte]](3))
      }
  }
}
