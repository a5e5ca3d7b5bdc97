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

  /** Deterministic 8×8 quadrant PNG: TL black, TR white, BL red,
    * BR green — encoded with the JDK's own ImageIO writer. */
  private def quadrantPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val c =
        if (x < 4 && y < 4) 0x000000
        else if (x >= 4 && y < 4) 0xffffff
        else if (x < 4) 0xff0000
        else 0x00ff00
      img.setRGB(x, y, c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image decode is REAL: PNG pixels drive the luminance histogram") {
    // quadrants: black → luma 0 (bin 0), white → 255 (bin 15),
    // red → 299·255/1000 = 76 (bin 4), green → 587·255/1000 = 149
    // (bin 9); 16 pixels each of 64 ⇒ 0.25 per bin
    val png = quadrantPng()
    val out = extractFeatures(Seq(media(1, "image", png)).toDS()).head()
    val f = out.features
    assert(f(0) === 0.25f && f(15) === 0.25f && f(4) === 0.25f && f(9) === 0.25f,
      s"pixel histogram wrong: ${f.toSeq}")
    assert(f.sum === 1.0f)
    // and it is NOT the byte-histogram stub over the encoded PNG
    assert(f.toSeq !== stubDecode(png).toSeq,
      "features match the byte stub — the image was never decoded")
  }

  test("corrupt image bytes fall back to the stub instead of failing the task") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val out = extractFeatures(Seq(media(2, "image", junk)).toDS()).head()
    assert(out.features.toSeq === stubDecode(junk).toSeq)
  }

  test("image resize is REAL: nearest-neighbor pixels survive the PNG round trip") {
    val out = resizeTo(Seq(media(3, "image", quadrantPng())).toDS(),
      targetBytes = 9999, targetW = 2, targetH = 2).head()
    assert(out.meta.width === 2 && out.meta.height === 2)
    val img = readImage(out.payload).get
    assert(img.getWidth === 2 && img.getHeight === 2)
    // NN sampling hits (0,0), (4,0), (0,4), (4,4) — the quadrant colors
    assert((img.getRGB(0, 0) & 0xffffff) === 0x000000)
    assert((img.getRGB(1, 0) & 0xffffff) === 0xffffff)
    assert((img.getRGB(0, 1) & 0xffffff) === 0xff0000)
    assert((img.getRGB(1, 1) & 0xffffff) === 0x00ff00)
  }

  /** Deterministic 8 kHz 16-bit mono WAV: a square wave flipping sign
    * every 8 samples at ±16384 — encoded with the JDK's own
    * javax.sound.sampled writer. 8000 samples ⇒ each of the 8 feature
    * windows holds 1000 samples starting on a flip boundary
    * (1000 = 8·125), so RMS and ZCR are exact: RMS = 16384/32768 = 0.5
    * and crossings = |{i ∈ (0,1000) : 8 | i}| = 124 per window. */
  private def squareWav(): Array[Byte] = {
    val samples = Array.tabulate[Short](8000)(i =>
      if ((i / 8) % 2 == 0) 16384 else -16384)
    wavBytes(samples, channels = 1)
  }

  /** Interleaved 16-bit little-endian samples → WAV container bytes. */
  private def wavBytes(interleaved: Array[Short], channels: Int): Array[Byte] = {
    val bytes = new Array[Byte](interleaved.length * 2)
    for (i <- interleaved.indices) {
      bytes(2 * i) = (interleaved(i) & 0xff).toByte
      bytes(2 * i + 1) = ((interleaved(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt,
      interleaved.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio decode is REAL: WAV samples drive RMS + zero-crossing features") {
    val wav = squareWav()
    val out = extractFeatures(Seq(media(7, "audio", wav)).toDS()).head()
    val f = out.features
    assert(f.length === 16)
    for (w <- 0 until 8) {
      assert(f(2 * w) === 0.5f, s"window $w RMS: ${f(2 * w)}")
      assert(f(2 * w + 1) === 124f / 999f, s"window $w ZCR: ${f(2 * w + 1)}")
    }
    // and it is NOT the byte-histogram stub over the WAV container
    assert(f.toSeq !== stubDecode(wav).toSeq,
      "features match the byte stub — the audio was never decoded")
  }

  test("readAudio mixes stereo to mono by integer average") {
    // stereo frames L=1000, R=3001 → mono (1000+3001)/2 = 2000 (int div)
    val interleaved = Array.fill(100)(Seq[Short](1000, 3001)).flatten
    val mono = readAudio(wavBytes(interleaved, channels = 2)).get
    assert(mono.length === 100)
    assert(mono.forall(_ === 2000.toShort), s"head: ${mono.take(4).toSeq}")
  }

  test("corrupt audio bytes fall back to the stub instead of failing the task") {
    val junk = Array.tabulate[Byte](64)(i => (i * 13).toByte)
    val out = extractFeatures(Seq(media(8, "audio", junk)).toDS()).head()
    assert(out.features.toSeq === stubDecode(junk).toSeq)
  }

  test("aHash fixture: PNG round-trip returns the formula's raw gray samples") {
    // grayscale PNG is lossless AND readImage must not color-convert
    // (getRGB on a gray raster would run the gray→sRGB transform and
    // silently distort every pixel — the raster-sample path is load-
    // bearing for the m06 oracle's pixel replay)
    for (seed <- Seq(0L, 7L, 123L); pert <- Seq(false, true)) {
      val img = readImage(synthGrayPng(seed, pert)).get
      assert(img.getWidth === 32 && img.getHeight === 32)
      for (y <- 0 until 32; x <- 0 until 32)
        assert(img.getRaster.getSample(x, y, 0) === synthPixel(seed, x, y, pert),
          s"pixel ($x,$y) of seed=$seed pert=$pert diverged from the formula")
    }
  }

  test("aHash: perturbed re-render lands within a few bits; distinct seeds far apart") {
    def hash(seed: Long, pert: Boolean) =
      aHashWords(readImage(synthGrayPng(seed, pert)).get)
    def hamming(a: Array[Int], b: Array[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    for (seed <- Seq(14L, 21L, 98L)) {
      val d = hamming(hash(seed, pert = false), hash(seed, pert = true))
      assert(d <= 6, s"planted near-dup of seed $seed at Hamming $d > 6")
    }
    val far = hamming(hash(3L, pert = false), hash(4L, pert = false))
    assert(far > 6, s"unrelated seeds at Hamming $far — fixture degenerate")
  }

  test("aHash handles non-multiple-of-8 dims with exact cross-multiplied bits") {
    // 33×17: unequal integer blocks — the cross-multiplied mean rule
    // must still emit a well-defined 64-bit hash deterministically
    val png = synthGrayPng(5L, perturbed = false, w = 33, h = 17)
    val h1 = aHashWords(readImage(png).get)
    val h2 = aHashWords(readImage(png).get)
    assert(h1.toSeq === h2.toSeq)
    assert(h1.exists(_ != 0), "hash of a textured image cannot be all-zero")
    assert(h1.forall(w => w >= 0 && w <= 0xffff), "words must be 16-bit")
  }

  test("aHashTable excludes corrupt payloads instead of hashing them alike") {
    val junk1 = Array[Byte](1, 2, 3)
    val junk2 = Array[Byte](9, 9, 9, 9)
    val rows = Seq(
      media(1L, "image", synthGrayPng(1L, perturbed = false)),
      media(2L, "image", junk1),
      media(3L, "image", junk2)).toDS()
    val table = aHashTable(rows)
    val ids = table.select("doc_id").collect().map(_.getLong(0)).sorted
    // a defaulted zero-hash would make docs 2 and 3 a Hamming-0
    // "duplicate" pair of two unrelated corrupt blobs
    assert(ids.toSeq === Seq(1L), "corrupt payloads must be excluded, not defaulted")
  }

  test("m06: banded candidates find exactly the verified planted near-dups") {
    val df = graft.queries.MultimodalQueries.m06PerceptualHash
      .fn(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "the sf0.001 corpus plants ~7 near-dup pairs")
    rows.foreach { case (a, b, ham) =>
      assert(ham <= 6)
      assert(a < b)
      assert(b === a + 1,
        s"pair ($a,$b) is not a planted predecessor pair — " +
          "random collisions must be verified away at this corpus size")
    }
    val planted = rows.count { case (a, b, _) => b == a + 1 && b % 7 == 1 }
    assert(planted === rows.length)
  }

  test("m07 fixture: WAV round-trip returns the formula's exact PCM samples") {
    for (seed <- Seq(0L, 6L, 41L); pert <- Seq(false, true)) {
      val decoded = readAudio(synthClipWav(seed, pert)).get
      assert(decoded.length === 2048)
      var i = 0
      while (i < 2048) {
        assert(decoded(i) === synthSample(seed, i, pert),
          s"sample $i of seed=$seed pert=$pert diverged")
        i += 1
      }
    }
  }

  test("m07: perturbation moves only window 2's energy; the other band matches exactly") {
    def sig(seed: Long, pert: Boolean) =
      energySignature(readAudio(synthClipWav(seed, pert)).get)
    for (seed <- Seq(1L, 6L, 96L)) {
      val base = sig(seed, pert = false)
      val dup = sig(seed, pert = true)
      assert((0 to 7).filter(w => base(w) != dup(w)) === Seq(2),
        "distortion must be confined to window 2")
      assert(math.abs(base(2) - dup(2)) <= 20000L,
        "the planted distortion must stay under the verify threshold")
    }
    // unrelated seeds: no band (4 consecutive sums) matches
    val a = sig(3L, pert = false)
    val b = sig(4L, pert = false)
    assert(a.take(4).toSeq !== b.take(4).toSeq)
    assert(a.drop(4).toSeq !== b.drop(4).toSeq)
  }

  test("energyTable excludes undecodable payloads") {
    val rows = Seq(
      media(1L, "audio", synthClipWav(1L, perturbed = false)),
      media(2L, "audio", Array[Byte](1, 2, 3))).toDS()
    val ids = energyTable(rows).select("doc_id").collect().map(_.getLong(0))
    assert(ids.toSeq === Seq(1L))
  }

  test("m07: banded candidates find exactly the verified planted near-dups") {
    val df = graft.queries.MultimodalQueries.m07AudioFingerprint
      .fn(spark, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, l1) =>
      assert(l1 <= 20000L && a < b)
      assert(b === a + 1 && b % 5 == 2,
        s"pair ($a,$b) is not a planted predecessor pair")
    }
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
