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
  * Codec status: IMAGES decode for real — `javax.imageio` ships in
  * the JDK (PNG/BMP/GIF/JPEG), so no external jars are needed even in
  * a zero-egress environment; kind == "image" payloads are decoded to
  * pixels, featurized as a deterministic integer-luma histogram, and
  * resized with nearest-neighbor resampling + PNG re-encode.
  * AUDIO decodes for real too (round 6) — `javax.sound.sampled` is
  * likewise JDK-native for WAV/AIFF/AU PCM containers; kind == "audio"
  * payloads are decoded to 16-bit samples and featurized as per-window
  * RMS + zero-crossing rate (integer accumulation, so the features are
  * bit-deterministic across JVMs). Only VIDEO remains the documented
  * STUB (the JDK carries no video codec): a deterministic
  * byte-statistics featurizer, clearly marked below. An undecodable
  * "image"/"audio" payload falls back to the stub rather than failing
  * the task — a corrupt blob in a 100 TB corpus must never kill the
  * job.
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

  /** ======= STUB CODEC (video only since round 6) =======
    * Deterministic stand-in for a real decoder: a 16-bin byte-value
    * histogram, L1-normalized. Images take the REAL [[readImage]]
    * path and audio the REAL [[readAudio]] path; this remains the
    * video featurizer (no JDK codec) and the corrupt-blob fallback. */
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

  /** ======= REAL IMAGE CODEC (JDK-native javax.imageio) ======= */

  /** Decode an image payload (PNG/BMP/GIF/JPEG — whatever the JDK's
    * registered readers accept). None for undecodable bytes: the
    * caller falls back to the stub instead of failing the task. */
  def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** 16-bin PIXEL-luminance histogram, L1-normalized — the real-image
    * analog of [[stubDecode]]'s byte histogram. Luma is the integer
    * Rec.601 weighting ((299·R + 587·G + 114·B) / 1000): pure int
    * math, so the features are bit-deterministic across JVMs. */
  def imageHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val bins = new Array[Float](16)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        bins(luma >>> 4) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.max(1, img.getWidth * img.getHeight).toFloat
    bins.map(_ / n)
  }

  /** ======= REAL AUDIO CODEC (JDK-native javax.sound.sampled) ======= */

  /** Decode an audio payload (WAV/AIFF/AU — the JDK's registered
    * readers) to mono 16-bit samples. Whatever the container's
    * encoding (8/16-bit, u-law, big/little endian), the stream is
    * first converted to signed 16-bit PCM at the source rate, then
    * channels are mixed to mono by integer average — all int math, so
    * the samples are bit-deterministic. None for undecodable bytes:
    * the caller falls back to the stub instead of failing the task. */
  def readAudio(payload: Array[Byte]): Option[Array[Short]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val src = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        try {
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val frames = bytes.length / (2 * ch)
          val mono = new Array[Short](frames)
          var f = 0
          while (f < frames) {
            var acc = 0
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              acc += ((bytes(o + 1) << 8) | (bytes(o) & 0xff))
              c += 1
            }
            mono(f) = (acc / ch).toShort
            f += 1
          }
          Some(mono)
        } finally pcm.close()
      } finally in.close()
    } catch { case _: Exception => None }

  /** Per-window RMS + zero-crossing-rate features over decoded
    * samples: 8 equal windows × (rms, zcr) = the same 16-float shape
    * as the histograms. Accumulation is integer (Long sum of squares,
    * int crossing count); the only float ops are one correctly-rounded
    * sqrt and two divisions per window, so features are
    * bit-deterministic across JVMs. RMS is normalized to [0,1] by the
    * 16-bit full scale; ZCR is crossings per sample pair. */
  def audioFeatures(samples: Array[Short], nWindows: Int = 8): Array[Float] = {
    val feats = new Array[Float](2 * nWindows)
    val n = samples.length
    if (n == 0) return feats
    var w = 0
    while (w < nWindows) {
      val start = (n.toLong * w / nWindows).toInt
      val end = (n.toLong * (w + 1) / nWindows).toInt
      var sumSq = 0L
      var crossings = 0
      var i = start
      while (i < end) {
        val s = samples(i).toLong
        sumSq += s * s
        if (i > start &&
          ((samples(i - 1) < 0 && samples(i) >= 0) ||
            (samples(i - 1) >= 0 && samples(i) < 0))) crossings += 1
        i += 1
      }
      val len = end - start
      if (len > 0) {
        feats(2 * w) =
          (math.sqrt(sumSq.toDouble / len) / 32768.0).toFloat
        feats(2 * w + 1) =
          if (len > 1) crossings.toFloat / (len - 1) else 0f
      }
      w += 1
    }
    feats
  }

  /** Kind-dispatched decode: real pixels for decodable images, real
    * samples for decodable audio, the documented stub for video (and
    * for corrupt image/audio bytes). */
  def decode(kind: String, payload: Array[Byte]): Array[Float] =
    kind match {
      case "image" =>
        readImage(payload).map(imageHistogram).getOrElse(stubDecode(payload))
      case "audio" =>
        readAudio(payload).map(audioFeatures(_)).getOrElse(stubDecode(payload))
      case _ => stubDecode(payload)
    }

  /** Feature extraction over a typed media Dataset — partition-batch
    * iterator in/out (mapInPandas analog). The iterator is streamed:
    * constant memory per task regardless of partition size. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r =>
        MediaFeatures(r.mediaId, r.meta.kind, decode(r.meta.kind, r.payload)))
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

  /** Nearest-neighbor image resize + PNG re-encode — deterministic
    * (manual integer-index resampling, no Graphics2D interpolation
    * whose rendering hints can vary). None for undecodable bytes. */
  def resizeImage(payload: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] =
    readImage(payload).map { img =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        var x = 0
        while (x < targetW) {
          out.setRGB(x, y,
            img.getRGB(x * img.getWidth / targetW, y * img.getHeight / targetH))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Resize: REAL pixel resampling + PNG re-encode for decodable
    * "image" payloads; the byte-level truncate-or-zero-pad contract
    * (to targetBytes) for every other kind and for corrupt image
    * bytes — both paths update metadata, exercising its propagation
    * through a transform. */
  def resizeTo(media: Dataset[MediaRow], targetBytes: Int,
      targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val out =
        (if (r.meta.kind == "image") resizeImage(r.payload, targetW, targetH)
         else None)
          .getOrElse(java.util.Arrays.copyOf(r.payload, targetBytes))
      r.copy(meta = r.meta.copy(width = targetW, height = targetH), payload = out)
    }
  }

  /** ======= PERCEPTUAL HASH (average-hash / aHash) =======
    * The published image-near-dup signature (the LAION-style dedup
    * family's cheapest member): downsample to an 8×8 grid of block
    * means, emit one bit per block — mean above the global mean — and
    * compare hashes by Hamming distance. All integer arithmetic
    * (block sums + one cross-multiplied comparison), so the hash is
    * bit-deterministic across JVMs and replayable in SQL. */

  /** 64-bit average-hash of a decoded image, returned as FOUR 16-bit
    * words (bit b = by·8+bx lives in word b/16 at position b%16) —
    * the v16 sign-word layout, ready for banded Hamming blocking.
    * Block bounds use the integer-partition rule (exact for any
    * dims); the mean comparison cross-multiplies so unequal block
    * sizes stay integer-exact: bit ⇔ bsum·W·H > total·blockPixels.
    * Grayscale rasters are read as RAW samples (getRGB would run the
    * gray→sRGB color transform and distort values); color images take
    * the integer Rec.601 luma. */
  def aHashWords(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val gray: (Int, Int) => Int =
      if (raster.getNumBands == 1) (x, y) => raster.getSample(x, y, 0)
      else (x, y) => {
        val rgb = img.getRGB(x, y)
        (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
      }
    val bsum = new Array[Long](64)
    val bpx = new Array[Long](64)
    var total = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val b = by * 8 + bx
        var y = h * by / 8
        while (y < h * (by + 1) / 8) {
          var x = w * bx / 8
          while (x < w * (bx + 1) / 8) {
            bsum(b) += gray(x, y)
            bpx(b) += 1
            x += 1
          }
          y += 1
        }
        total += bsum(b)
        bx += 1
      }
      by += 1
    }
    val words = new Array[Int](4)
    var b = 0
    while (b < 64) {
      if (bsum(b) * w * h > total * bpx(b))
        words(b / 16) |= 1 << (b % 16)
      b += 1
    }
    words
  }

  /** Deterministic synthetic grayscale image, encoded as a REAL PNG
    * through ImageIO — the m06 fixture generator. The pixel field is
    * a seed-MULTIPLIED mod-p mix (v = ((x·131 + y·197 + x·y·31 + 7) ·
    * m) mod p mod 256, m = (seed·1000003 + 12345) mod p): the seed
    * must enter multiplicatively, because any seed-ADDITIVE formula
    * makes every pair of images differ by a constant brightness
    * shift, which aHash (mean-relative by construction) maps to the
    * SAME hash — the first prototype of this fixture collided half
    * the corpus that way. `perturbed` re-renders the field with a
    * sparse +16 brightness bump (~28 of 1024 pixels) — a planted
    * near-duplicate whose hash lands within a few bits of its base.
    * Mirrored verbatim in the m06 oracle. */
  def synthPixel(seed: Long, x: Int, y: Int, perturbed: Boolean): Int = {
    val P = 1000000007L
    val m = (seed * 1000003L + 12345L) % P
    val v0 = ((((x * 131L + y * 197L + x.toLong * y * 31L + 7L) * m) % P) % 256L).toInt
    if (perturbed && (x * 31 + y) % 37 == 0) (v0 + 16) % 256 else v0
  }

  /** The hash-table stage of the perceptual-dedup pipeline (m06):
    * decode each payload, aHash to four 16-bit words. Undecodable
    * payloads are EXCLUDED, never defaulted — a shared fallback hash
    * would report every pair of corrupt blobs as a Hamming-0
    * duplicate of each other (review catch); surviving a bad blob
    * means excluding it from comparison, not fabricating pixels. */
  def aHashTable(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        readImage(r.payload).map(aHashWords)
          .map(ws => (r.mediaId, ws(0), ws(1), ws(2), ws(3)))
      }
    }.toDF("doc_id", "w0", "w1", "w2", "w3")
  }

  def synthGrayPng(seed: Long, perturbed: Boolean, w: Int = 32,
      h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, synthPixel(seed, x, y, perturbed))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** ======= AUDIO FINGERPRINT (banded energy signature) =======
    * The audio face of the perceptual-dedup family (m07): decode the
    * payload through the REAL `javax.sound.sampled` path
    * ([[readAudio]]), reduce to an 8-window INTEGER energy signature
    * (per-window Σ|sample| — pure long accumulation, replayable in
    * SQL), and mine near-dups with minhash-style banding over EXACT
    * half-signatures: a re-render whose distortion is confined to a
    * few windows still matches the untouched half exactly, while an
    * unrelated clip would need four 22-bit-entropy window sums to
    * collide at once. Chromaprint et al. use spectral landmarks; the
    * plumbing (decode → windowed integer reduce → banded join →
    * verify) is the same shape, codec-real end to end. */

  /** Per-window Σ|sample| signature over decoded samples — integer
    * bounds identical to [[audioFeatures]]'s windows. */
  def energySignature(samples: Array[Short], nWindows: Int = 8): Array[Long] = {
    val sig = new Array[Long](nWindows)
    val n = samples.length
    var w = 0
    while (w < nWindows) {
      val start = (n.toLong * w / nWindows).toInt
      val end = (n.toLong * (w + 1) / nWindows).toInt
      var i = start
      while (i < end) {
        sig(w) += math.abs(samples(i).toInt).toLong
        i += 1
      }
      w += 1
    }
    sig
  }

  /** 16-bit mono PCM WAV container around raw samples — a REAL
    * encode through `javax.sound.sampled.AudioSystem.write`, so the
    * m07 fixture exercises the genuine codec round trip. */
  def pcmWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PCM clip — the m07 fixture generator
    * (the audio analog of [[synthPixel]], same seed-MULTIPLIED mod-p
    * discipline so distinct clips share no affine structure).
    * `perturbed` re-renders with a +50 bump on every 17th sample of
    * window 2 only (N=2048 ⇒ samples 512..767) — a localized
    * distortion that moves one window's energy and leaves the other
    * band's half-signature bit-identical. Mirrored in the m07
    * oracle. */
  def synthSample(seed: Long, i: Int, perturbed: Boolean): Short = {
    val P = 1000000007L
    val m = (seed * 1000003L + 12345L) % P
    val u = (((i * 131L + 7L) * m) % P) % 65536L
    val u2 =
      if (perturbed && i >= 512 && i < 768 && i % 17 == 0) (u + 50L) % 65536L
      else u
    (u2 - 32768L).toShort
  }

  def synthClipWav(seed: Long, perturbed: Boolean, n: Int = 2048): Array[Byte] = {
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = synthSample(seed, i, perturbed)
      i += 1
    }
    pcmWav(samples)
  }

  /** The signature-table stage of m07: decode → 8-window integer
    * energy signature. Undecodable payloads are EXCLUDED (the
    * [[aHashTable]] discipline — a defaulted signature would pair up
    * unrelated corrupt blobs). */
  def energyTable(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        readAudio(r.payload).map(energySignature(_))
          .map(s => (r.mediaId, s(0), s(1), s(2), s(3), s(4), s(5), s(6), s(7)))
      }
    }.toDF("doc_id", "e0", "e1", "e2", "e3", "e4", "e5", "e6", "e7")
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
