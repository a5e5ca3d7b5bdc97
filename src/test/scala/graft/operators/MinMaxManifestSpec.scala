package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The data-skipping contract of the min/max file manifest: the
  * manifest really describes the layout, the pruned read really drops
  * files, and — the part that makes skipping safe — the pruned result
  * is byte-equal to the full scan under the same predicate. */
class MinMaxManifestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val lo = "2024-01-10 00:00:00"
  private val hi = "2024-01-13 00:00:00"

  private def withRoot[A](body: => A): A = {
    val dir = tmpDir("graft-manifest-spec")
    sys.props("graft.index.dir") = dir
    try body
    finally sys.props.remove("graft.index.dir")
  }

  test("manifest has one row per layout file, covering every row") {
    withRoot {
      MinMaxManifest.ensure(spark, sf)
      val files = spark.read.parquet(MinMaxManifest.layoutPath(sf))
        .select(input_file_name()).distinct().count()
      val manifest = spark.read.parquet(MinMaxManifest.manifestPath(sf))
      assert(manifest.count() === files)
      val total = manifest.agg(sum("rows")).head().getLong(0)
      assert(total === graft.Tables(spark, sf, "events").count(),
        "manifest row counts must cover the whole table")
    }
  }

  test("time-range read prunes files and matches the full scan exactly") {
    withRoot {
      val (pruned, kept, totalFiles) =
        MinMaxManifest.prunedEvents(spark, sf, lo, hi)
      // a 3-of-30-day predicate over a 16-file time-clustered layout
      // must drop most files — this is the operator's reason to exist
      assert(kept < totalFiles,
        s"pruning kept $kept of $totalFiles files — no skipping happened")
      assert(kept <= totalFiles / 2,
        s"a 10% time slice should prune at least half the files ($kept/$totalFiles)")
      val full = graft.Tables(spark, sf, "events")
        .where(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp"))
      assert(pruned.count() === full.count())
      val a = pruned.select("event_id").collect().map(_.getLong(0)).sorted
      val b = full.select("event_id").collect().map(_.getLong(0)).sorted
      assert(a.toSeq === b.toSeq,
        "pruned read must return exactly the full scan's rows")
    }
  }

  test("appendBatch: manifest gains rows for exactly the new files; pruning stays exact") {
    withRoot {
      import spark.implicits._
      MinMaxManifest.ensure(spark, sf)
      val baseManifest = spark.read.parquet(MinMaxManifest.manifestPath(sf)).count()
      // two "micro-batches" beyond the base table's time range, the
      // streaming foreachBatch shape (batch_id idempotence is the
      // caller's contract, as in StreamingDedup)
      def batch(day: Int, n: Int) = (0 until n).map { i =>
        (100000L + day * 1000 + i,
          java.sql.Timestamp.valueOf(f"2024-02-$day%02d 01:00:${i % 60}%02d"),
          7L, "append", 1.5, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      MinMaxManifest.appendBatch(spark, sf, batch(1, 40))
      MinMaxManifest.appendBatch(spark, sf, batch(2, 40))
      val manifest = spark.read.parquet(MinMaxManifest.manifestPath(sf))
      val files = spark.read.parquet(MinMaxManifest.layoutPath(sf))
        .select(input_file_name()).distinct().count()
      assert(manifest.count() === files,
        "manifest must track every layout file after appends")
      assert(manifest.count() > baseManifest, "appends must add manifest rows")
      // prune a window that covers ONLY the appended days
      val (pruned, kept, total) = MinMaxManifest.prunedEvents(
        spark, sf, "2024-02-01 00:00:00", "2024-02-03 00:00:00")
      assert(pruned.count() === 80L, "append window must return the appended rows")
      assert(kept < total.toInt,
        "the base files must be skipped for an append-only window")
      // and the original base window is untouched by the appends
      val (basePruned, _, _) = MinMaxManifest.prunedEvents(spark, sf, lo, hi)
      val full = graft.Tables(spark, sf, "events")
        .where(col("ts") >= lit(lo).cast("timestamp") &&
          col("ts") < lit(hi).cast("timestamp"))
      assert(basePruned.count() === full.count())
    }
  }

  test("a torn append (data files without manifest rows) heals on the next read") {
    withRoot {
      import spark.implicits._
      MinMaxManifest.ensure(spark, sf)
      // simulate the crash window: data lands in the layout but the
      // manifest append never ran (bypass appendBatch's second write)
      Seq((999999L, java.sql.Timestamp.valueOf("2024-03-01 12:00:00"),
        9L, "torn", 2.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append")
        .parquet(MinMaxManifest.layoutPath(sf))
      val (pruned, kept, _) = MinMaxManifest.prunedEvents(
        spark, sf, "2024-03-01 00:00:00", "2024-03-02 00:00:00")
      assert(kept >= 1, "the healed manifest must surface the torn file")
      assert(pruned.count() === 1L,
        "rows from a torn append must become visible after healing")
      // and the manifest now records the file durably
      val m = spark.read.parquet(MinMaxManifest.manifestPath(sf))
      val files = spark.read.parquet(MinMaxManifest.layoutPath(sf))
        .select(input_file_name()).distinct().count()
      assert(m.count() === files)
    }
  }

  test("a window matching no files returns an empty frame, not an error") {
    withRoot {
      val (pruned, kept, total) = MinMaxManifest.prunedEvents(
        spark, sf, "2030-01-01 00:00:00", "2030-01-02 00:00:00")
      assert(kept === 0 && total > 0)
      assert(pruned.count() === 0L,
        "an out-of-range window is an empty result, matching the full scan")
    }
  }

  test("compact: appended batches fold back into the base file count, no rows lost") {
    withRoot {
      import spark.implicits._
      MinMaxManifest.ensure(spark, sf)
      def batch(day: Int) = (0 until 30).map { i =>
        (200000L + day * 1000 + i,
          java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:${i % 60}%02d"),
          3L, "compacted", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      MinMaxManifest.appendBatch(spark, sf, batch(10))
      MinMaxManifest.appendBatch(spark, sf, batch(11))
      val beforeRows = spark.read.parquet(MinMaxManifest.layoutPath(sf)).count()
      val beforeFiles = spark.read.parquet(MinMaxManifest.manifestPath(sf)).count()
      MinMaxManifest.compact(spark, sf)
      val layout = spark.read.parquet(MinMaxManifest.layoutPath(sf))
      assert(layout.count() === beforeRows,
        "compaction must preserve every row, including appended batches")
      val manifest = spark.read.parquet(MinMaxManifest.manifestPath(sf))
      assert(manifest.count() === MinMaxManifest.NumFiles.toLong,
        "compaction must restore the target file count")
      assert(manifest.count() < beforeFiles,
        "compaction should reduce the appended file count")
      // manifest paths are live (post-swap), and pruning still works:
      // the appended 2024-02 rows are found through the fresh layout
      val (pruned, kept, total) = MinMaxManifest.prunedEvents(
        spark, sf, "2024-02-10 00:00:00", "2024-02-12 00:00:00")
      assert(pruned.count() === 60L)
      assert(kept < total.toInt, "compacted layout must still skip files")
    }
  }

  test("compactSmall: packs only undersized files, renames the rest, preserves rows") {
    withRoot {
      import spark.implicits._
      MinMaxManifest.ensure(spark, sf)
      // many single-file micro-batches -> a long small-file tail
      def batch(day: Int) = (0 until 3).map { i =>
        (300000L + day * 1000 + i,
          java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:${i % 60}%02d"),
          3L, "opt", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      (10 to 17).foreach(d =>
        MinMaxManifest.appendBatch(spark, sf, batch(d), batchFiles = 1))
      val lp = MinMaxManifest.layoutPath(sf)
      val beforeRows = spark.read.parquet(lp).count()
      val manifestBefore = spark.read.parquet(MinMaxManifest.manifestPath(sf))
        .select("path", "rows").as[(String, Long)].collect().toMap
      val beforeFiles = manifestBefore.size
      // target sized so the BASE files (a 16-way split of the table)
      // count as right-sized and the 8 micro-batch files as small
      val sizes = new java.io.File(lp).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sorted
      // the layout is bimodal: 8 tiny micro-batch files + 16 base
      // files. target/2 sits just above the largest micro file, so
      // exactly the micro tail counts as small and bins hold ~2 files
      val target = sizes(7) * 2 + 2
      val bins = MinMaxManifest.compactSmall(spark, sf, targetBytes = target)
      assert(bins >= 1, "the micro-batch tail must pack into at least one bin")
      val layout = spark.read.parquet(lp)
      assert(layout.count() === beforeRows, "optimize must preserve every row")
      val manifestAfter = spark.read.parquet(MinMaxManifest.manifestPath(sf))
        .select("path", "rows").as[(String, Long)].collect().toMap
      assert(manifestAfter.size < beforeFiles,
        s"optimize must reduce file count (${manifestAfter.size} vs $beforeFiles)")
      // right-sized files are untouched: same path, same manifest row
      val keptBoth = manifestBefore.keySet.intersect(manifestAfter.keySet)
      assert(keptBoth.nonEmpty, "some right-sized files must survive by rename")
      keptBoth.foreach(p =>
        assert(manifestBefore(p) === manifestAfter(p),
          s"kept file $p must keep its manifest stats"))
      // pruning still exact over the packed region
      val (pruned, kept, total) = MinMaxManifest.prunedEvents(
        spark, sf, "2024-02-10 00:00:00", "2024-02-12 00:00:00")
      assert(pruned.count() === 6L)
      assert(kept < total, "optimized layout must still skip files")
      // idempotent: a second optimize finds nothing worth packing at
      // the same target (the packed bins are now right-sized or lone)
      val again = MinMaxManifest.compactSmall(spark, sf, targetBytes = target)
      assert(spark.read.parquet(lp).count() === beforeRows)
      assert(again <= bins)
    }
  }

  test("compactSmall fails loudly on a concurrent append, losing nothing") {
    withRoot {
      import spark.implicits._
      MinMaxManifest.ensure(spark, sf)
      def batch(id: Long, day: Int) = Seq(
        (id, java.sql.Timestamp.valueOf(f"2024-02-$day%02d 09:00:00"),
          3L, "opt", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      (1 to 4).foreach(d =>
        MinMaxManifest.appendBatch(spark, sf, batch(400000L + d, d),
          batchFiles = 1))
      val beforeRows = spark.read.parquet(MinMaxManifest.layoutPath(sf)).count()
      val racing = () => MinMaxManifest.appendBatch(spark, sf,
        batch(499999L, 20), batchFiles = 1)
      intercept[IllegalStateException] {
        MinMaxManifest.compactSmall(spark, sf,
          targetBytes = Long.MaxValue / 4, onStagedForTest = racing)
      }
      // nothing lost: the old layout (incl. the racing batch) is live
      assert(spark.read.parquet(MinMaxManifest.layoutPath(sf)).count()
        === beforeRows + 1)
    }
  }

  test("appendBatch composes with Structured Streaming foreachBatch end to end") {
    withRoot {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.functions.{col => c}
      val s2 = spark
      import s2.implicits._
      MinMaxManifest.ensure(spark, sf)
      implicit val sq = spark.sqlContext
      val src = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double, String)]
      val q = src.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          MinMaxManifest.appendBatch(spark, sf, b)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      src.addData((500000L, java.sql.Timestamp.valueOf("2024-04-01 10:00:00"),
        1L, "stream", 1.0, "{}"))
      src.addData((500001L, java.sql.Timestamp.valueOf("2024-04-02 10:00:00"),
        2L, "stream", 2.0, "{}"))
      q.awaitTermination(60000)
      val (pruned, kept, total) = MinMaxManifest.prunedEvents(
        spark, sf, "2024-04-01 00:00:00", "2024-04-03 00:00:00")
      assert(pruned.count() === 2L,
        "rows written through the streaming sink must be prunable-readable")
      assert(kept < total.toInt, "base files must be skipped for the stream window")
      assert(pruned.where(c("event_type") === "stream").count() === 2L)
    }
  }

  test("appendBatch refuses to append before the layout exists") {
    withRoot {
      import spark.implicits._
      val b = Seq((1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        1L, "x", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      intercept[IllegalArgumentException] {
        MinMaxManifest.appendBatch(spark, sf, b)
      }
    }
  }

  test("compact fails loudly on a concurrent append, losing nothing") {
    withRoot {
      import spark.implicits._
      MinMaxManifest.ensure(spark, sf)
      def batch(id: Long, day: Int) = Seq(
        (id, java.sql.Timestamp.valueOf(f"2024-05-$day%02d 12:00:00"),
          5L, "race", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      MinMaxManifest.appendBatch(spark, sf, batch(700000L, 1))
      val rowsBefore = spark.read.parquet(MinMaxManifest.layoutPath(sf)).count()
      // a batch lands AFTER the rewrite read its input, BEFORE the
      // swap — exactly the window the r6 advice flagged as silent loss
      val e = intercept[IllegalStateException] {
        MinMaxManifest.compact(spark, sf, onStagedForTest =
          () => MinMaxManifest.appendBatch(spark, sf, batch(700001L, 2)))
      }
      assert(e.getMessage.contains("concurrent write detected"))
      // NOTHING lost: base + both batches all present, old layout live
      val layout = spark.read.parquet(MinMaxManifest.layoutPath(sf))
      assert(layout.count() === rowsBefore + 1,
        "the aborted compaction must leave base rows and BOTH batches intact")
      assert(layout.where(col("event_id") === 700001L).count() === 1L,
        "the racing batch's rows must survive the aborted compaction")
      // quiesced re-run succeeds and folds everything in
      MinMaxManifest.compact(spark, sf)
      assert(spark.read.parquet(MinMaxManifest.layoutPath(sf)).count()
        === rowsBefore + 1)
    }
  }

  test("pruning and the row predicate agree on a non-UTC session timezone") {
    withRoot {
      val saved = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val (pruned, kept, total) = MinMaxManifest.prunedEvents(spark, sf, lo, hi)
        assert(kept < total, "pruning must still drop files")
        // ground truth: the UTC-instant window over the raw table —
        // built from the same Timestamp instants prunedEvents uses,
        // independent of the session zone
        def utc(t: String) = java.sql.Timestamp.from(
          java.time.LocalDateTime.parse(t.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC))
        val full = graft.Tables(spark, sf, "events")
          .where(col("ts") >= lit(utc(lo)) && col("ts") < lit(utc(hi)))
        assert(pruned.count() === full.count(),
          "boundary-file rows must not shift with the session timezone")
        val a = pruned.select("event_id").collect().map(_.getLong(0)).sorted
        val b = full.select("event_id").collect().map(_.getLong(0)).sorted
        assert(a.toSeq === b.toSeq)
      } finally spark.conf.set("spark.sql.session.timeZone", saved)
    }
  }

  test("the pruned plan scans only kept layout files, never the raw table") {
    withRoot {
      val (pruned, kept, _) = MinMaxManifest.prunedEvents(spark, sf, lo, hi)
      val scanned = pruned.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(scanned.length <= kept)
      assert(scanned.forall(_.contains("events_by_ts")),
        s"pruned read must serve the clustered layout: ${scanned.toSeq}")
      assert(!scanned.exists(_.contains("events.parquet")),
        "pruned read must not fall back to the raw events table")
    }
  }

  private val fullLo = "2024-01-01 00:00:00"
  private val fullHi = "2024-03-01 00:00:00"

  test("time travel: as-of reads replay each historical state exactly") {
    withRoot {
      import spark.implicits._
      val M = MinMaxManifest
      val ev = graft.Tables(spark, sf, "events")
      val (b1, b2) = (M.utc("2024-01-11 00:00:00"), M.utc("2024-01-21 00:00:00"))
      M.ensureHistory(spark, sf, "tt",
        ev.where(col("ts") < lit(b1)),
        Seq(ev.where(col("ts") >= lit(b1) && col("ts") < lit(b2)),
          ev.where(col("ts") >= lit(b2))))
      def ids(snap: Long): Seq[Long] =
        M.asOfEvents(spark, sf, snap, fullLo, fullHi, "tt")._1
          .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      def exp(pred: org.apache.spark.sql.Column): Seq[Long] =
        ev.where(pred).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids(0L) === exp(col("ts") < lit(b1)))
      assert(ids(1L) === exp(col("ts") < lit(b2)))
      assert(ids(2L) === exp(lit(true)))
      // snapshot immutability under LATE-ARRIVING data: an append whose
      // EVENT time predates b1 must land in a NEW snapshot, not leak
      // into history — time travel versions by ingestion order
      val late = Seq((999999L,
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 1L, "late", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      M.appendBatch(spark, sf, late, table = "tt")
      assert(ids(0L) === exp(col("ts") < lit(b1)),
        "a late append must not rewrite historical snapshots")
      assert(ids(1L) === exp(col("ts") < lit(b2)))
      assert(ids(3L).contains(999999L), "the new snapshot must see the append")
      // idempotent replay: ensureHistory sees the completed history...
      // (max snap is now 3, not batches.length=2 — still "complete
      // or beyond", must not rebuild and drop the extra snapshot)
      val (_, _, filesInSnap3) = M.asOfEvents(spark, sf, 3L, fullLo, fullHi, "tt")
      assert(filesInSnap3 > 0)
    }
  }

  test("time travel: a statted-but-unlogged file heals into a repair snapshot") {
    withRoot {
      import spark.implicits._
      val M = MinMaxManifest
      val ev = graft.Tables(spark, sf, "events")
      M.ensureHistory(spark, sf, "torn", ev, Seq.empty)
      val before = M.asOfEvents(spark, sf, 0L, fullLo, fullHi, "torn")._1.count()
      // simulate appendBatch crashing after the DATA write: the file
      // exists in the layout but neither manifest nor log knows it
      Seq((888888L, java.sql.Timestamp.valueOf("2024-02-15 12:00:00"),
        2L, "torn", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(M.layoutPath(sf, "torn"))
      // snapshot 0 is immutable through the repair...
      val snap0 = M.asOfEvents(spark, sf, 0L, fullLo, fullHi, "torn")._1
      assert(snap0.where(col("event_id") === 888888L).count() === 0L)
      assert(snap0.count() === before)
      // ...and the healed file is readable under the repair snapshot
      val repaired = M.asOfEvents(spark, sf, 1L, fullLo, fullHi, "torn")._1
      assert(repaired.where(col("event_id") === 888888L).count() === 1L)
    }
  }

  test("time travel: a compaction that crashed before its log reset heals, never reads empty") {
    withRoot {
      import spark.implicits._
      val M = MinMaxManifest
      M.ensure(spark, sf)
      val batch = (0 until 10).map { i =>
        (400000L + i, java.sql.Timestamp.valueOf(f"2024-02-25 10:00:${i % 60}%02d"),
          6L, "crash", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      M.appendBatch(spark, sf, batch)
      val totalRows = spark.read.parquet(M.layoutPath(sf)).count()
      // capture the pre-compaction log, compact, then put the OLD log
      // back — exactly the state a crash between compact()'s swaps and
      // its log reset leaves: every logged path now names a dead file
      val oldLog = spark.read.parquet(M.snapshotsPath(sf)).collect()
      M.compact(spark, sf)
      spark.createDataFrame(
          spark.sparkContext.parallelize(oldLog.toIndexedSeq, 1),
          spark.read.parquet(M.snapshotsPath(sf)).schema)
        .coalesce(1).write.mode("overwrite").parquet(M.snapshotsPath(sf))
      // the dead references must complete the crashed expiry (log
      // reset to snapshot 0 = live manifest), NOT silently read empty
      val (asOf0, kept, _) = M.asOfEvents(spark, sf, 0L, fullLo, fullHi)
      assert(kept > 0, "historical read must not silently turn empty")
      assert(asOf0.count() === totalRows)
      assert(spark.read.parquet(M.snapshotsPath(sf))
        .agg(max("snap_id")).head().getLong(0) === 0L)
    }
  }

  test("time travel: compaction expires history and restarts the log at snapshot 0") {
    withRoot {
      import spark.implicits._
      val M = MinMaxManifest
      M.ensure(spark, sf)
      val batch = (0 until 20).map { i =>
        (300000L + i, java.sql.Timestamp.valueOf(f"2024-02-20 10:00:${i % 60}%02d"),
          5L, "exp", 2.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      M.appendBatch(spark, sf, batch)
      val totalRows = spark.read.parquet(M.layoutPath(sf)).count()
      M.compact(spark, sf)
      val log = spark.read.parquet(M.snapshotsPath(sf))
      assert(log.agg(max("snap_id")).head().getLong(0) === 0L,
        "compaction must restart the snapshot log")
      assert(log.count() === M.NumFiles.toLong)
      val (asOf0, _, _) = M.asOfEvents(spark, sf, 0L, fullLo, fullHi)
      assert(asOf0.count() === totalRows,
        "post-compaction snapshot 0 is the full compacted contents")
    }
  }

  test("shallow clone: metadata-only, serves the source exactly, diverges on append") {
    withRoot {
      import spark.implicits._
      val M = MinMaxManifest
      val (src, dst) = ("events_cl_a", "events_cl_b")
      val ev = graft.Tables(spark, sf, "events")
      M.ensureFrom(spark, sf, ev, src)
      M.cloneTable(spark, sf, src, dst)
      // METADATA-ONLY: the clone's own layout dir holds no data files
      val dstFiles = new java.io.File(M.layoutPath(sf, dst)).listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(dstFiles === 0, "a fresh clone must own zero data files")
      // the clone serves the source's rows exactly (shared files)
      val (srcR, _, _) = M.prunedEvents(spark, sf, fullLo, fullHi, src)
      val (dstR, _, _) = M.prunedEvents(spark, sf, fullLo, fullHi, dst)
      val srcRows = srcR.collect().map(_.toString).sorted.toSeq
      assert(dstR.collect().map(_.toString).sorted.toSeq === srcRows,
        "the clone must serve the shared files row-for-row")
      // DIVERGENCE: append to the clone only
      val batch = (0 until 25).map { i =>
        (400000L + i, java.sql.Timestamp.valueOf(f"2024-02-25 09:00:${i % 60}%02d"),
          9L, "branch", 3.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val srcListing = new java.io.File(M.layoutPath(sf, src)).listFiles()
        .map(f => f.getName -> f.length()).sortBy(_._1).toSeq
      M.appendBatch(spark, sf, batch, table = dst)
      // the source is untouched byte-for-byte and serves the same rows
      assert(new java.io.File(M.layoutPath(sf, src)).listFiles()
        .map(f => f.getName -> f.length()).sortBy(_._1).toSeq === srcListing,
        "appending to the clone must never touch the source's files")
      val (srcR2, _, _) = M.prunedEvents(spark, sf, fullLo, fullHi, src)
      assert(srcR2.collect().map(_.toString).sorted.toSeq === srcRows)
      // the clone = source + batch, through a heal-exercising read
      val (dstR2, _, _) = M.prunedEvents(spark, sf, fullLo, fullHi, dst)
      assert(dstR2.count() === srcRows.size + 25L,
        "the clone must serve shared files PLUS its own appends")
      assert(dstR2.where($"event_type" === "branch").count() === 25L)
      // the clone's history restarted: snapshot 0 = the clone-time
      // file set (no 'branch' rows), snapshot 1 adds the append
      val (asOf0, _, _) = M.asOfEvents(spark, sf, 0L, fullLo, fullHi, dst)
      assert(asOf0.where($"event_type" === "branch").count() === 0L,
        "clone snapshot 0 must predate the divergent append")
      assert(asOf0.count() === srcRows.size.toLong)
      // rewrite ops refuse while shared files remain
      val e = intercept[IllegalArgumentException] {
        M.compactSmall(spark, sf, dst)
      }
      assert(e.getMessage.contains("shallow clone"),
        s"compaction on a shallow clone must refuse loudly: ${e.getMessage}")
      // and clone-target collision refuses
      intercept[IllegalArgumentException] {
        M.cloneTable(spark, sf, src, dst)
      }
    }
  }

  test("compact() refuses a shallow clone under the default table name (r10 advice)") {
    withRoot {
      val M = MinMaxManifest
      // clone INTO the default table name: compact(spark, dir) would
      // rebuild the manifest from the layout listing alone and
      // silently drop every shared-file row — the guard must refuse
      val ev = graft.Tables(spark, sf, "events")
      M.ensureFrom(spark, sf, ev, "events_cl_src")
      M.cloneTable(spark, sf, "events_cl_src", "events_by_ts")
      val e = intercept[IllegalArgumentException] {
        M.compact(spark, sf)
      }
      assert(e.getMessage.contains("shallow clone"),
        s"compact() on a shallow clone must refuse loudly: ${e.getMessage}")
    }
  }
}
