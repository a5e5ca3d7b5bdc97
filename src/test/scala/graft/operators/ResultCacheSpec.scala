package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The result-cache contract: identical plans over unchanged sources
  * hit (served from the entry, row order preserved, source never
  * rescanned); any semantic difference or source mutation re-keys;
  * plans whose data lives outside the canonicalized string never
  * cache. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(dir: String): Unit =
    (1L to 500L).map(i => (i % 7, i)).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")

  test("miss then hit: the entry serves, ordered, without rescanning the source") {
    withIndexRoot("graft-rc") {
      val dir = tmpDir("graft-rc-data")
      writeTable(dir)
      def shape = graft.Tables(spark, dir, "t")
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .orderBy($"k".desc)
      val (first, hit1) = ResultCache.through(spark, shape)
      val firstRows = first.collect().map(_.toString).toSeq
      assert(!hit1, "a cold cache must miss")
      val (second, hit2) = ResultCache.through(spark, shape)
      assert(hit2, "the identical plan must hit")
      assert(second.inputFiles.forall(_.contains("result_cache")),
        "a hit must not touch the source table")
      assert(second.collect().map(_.toString).toSeq === firstRows,
        "row ORDER survives the cache (coalesce(1) write)")
      // a rebuilt session-independent equivalent also hits: the
      // canonicalized plan normalizes exprIds
      assert(ResultCache.through(spark, shape)._2)
    }
  }

  test("semantic differences and source mutations re-key; never a stale serve") {
    withIndexRoot("graft-rc-inv") {
      val dir = tmpDir("graft-rc-inv-data")
      writeTable(dir)
      def shapeLt(cut: Long) = graft.Tables(spark, dir, "t")
        .where($"v" <= cut).groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k")
      assert(!ResultCache.through(spark, shapeLt(100L))._2)
      assert(ResultCache.through(spark, shapeLt(100L))._2)
      // a different literal is a different plan
      assert(!ResultCache.through(spark, shapeLt(200L))._2)
      // mutate the source: the stamp changes, the old entry is dead
      (1L to 600L).map(i => (i % 7, i)).toDF("k", "v")
        .write.mode("overwrite").parquet(s"$dir/t.parquet")
      val (fresh, hit) = ResultCache.through(spark, shapeLt(100L))
      assert(!hit, "a mutated source must miss")
      assert(fresh.agg(sum($"n")).head().getLong(0) === 100L)
    }
  }

  test("the sweep keeps the newest entries; a swept live entry just re-misses") {
    withIndexRoot("graft-rc-sweep") {
      val dir = tmpDir("graft-rc-sweep-data")
      writeTable(dir)
      def shape(cut: Long) = graft.Tables(spark, dir, "t")
        .where($"v" <= cut).groupBy($"k").agg(count(lit(1)).as("n"))
      (1L to 4L).foreach(c => ResultCache.through(spark, shape(c * 50)))
      assert(ResultCache.sweep(spark, maxEntries = 2) === 2)
      assert(ResultCache.sweep(spark, maxEntries = 2) === 0, "idempotent")
      // a swept entry is a MISS, never a wrong answer
      val (df, hit) = ResultCache.through(spark, shape(50))
      assert(df.agg(sum($"n")).head().getLong(0) === 50L)
    }
  }

  test("time-dependent and non-deterministic plans never cache") {
    withIndexRoot("graft-rc-time") {
      val dir = tmpDir("graft-rc-time-data")
      writeTable(dir)
      // current_timestamp canonicalizes identically across runs while
      // its VALUE moves: a second run would hit and serve the earlier
      // moment's rows — so it must never enter the cache
      def nowShape = graft.Tables(spark, dir, "t")
        .where(current_timestamp() > lit("2000-01-01").cast("timestamp"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
      assert(!ResultCache.through(spark, nowShape)._2)
      assert(!ResultCache.through(spark, nowShape)._2,
        "a time-dependent plan must MISS every run")
      def dateShape = graft.Tables(spark, dir, "t")
        .select($"k", current_date().as("d"))
      assert(!ResultCache.through(spark, dateShape)._2)
      assert(!ResultCache.through(spark, dateShape)._2)
      def randShape = graft.Tables(spark, dir, "t")
        .where(rand() >= 0.0).groupBy($"k").agg(count(lit(1)).as("n"))
      assert(!ResultCache.through(spark, randShape)._2)
      assert(!ResultCache.through(spark, randShape)._2,
        "non-deterministic plans are uncacheable")
      // and the screen must not over-fire: a deterministic timestamp
      // LITERAL still caches
      def litShape = graft.Tables(spark, dir, "t")
        .where(lit("2000-01-01").cast("timestamp") < lit("2001-01-01").cast("timestamp"))
        .groupBy($"k").agg(count(lit(1)).as("n")).orderBy($"k")
      assert(!ResultCache.through(spark, litShape)._2)
      assert(ResultCache.through(spark, litShape)._2,
        "deterministic plans keep hitting")
    }
  }

  test("staged-write commit: a lost publish race discards the stage and serves the winner") {
    withIndexRoot("graft-rc-race") {
      val dir = tmpDir("graft-rc-race-data")
      writeTable(dir)
      val shape = graft.Tables(spark, dir, "t")
        .groupBy($"k").agg(count(lit(1)).as("n")).orderBy($"k")
      val path = s"${IndexStore.root}/result_cache/race_entry"
      // deterministic loser leg: the first commit wins, the second
      // (same key, simulating the concurrent miss that lost) must
      // find the path taken, delete its stage, and report false
      assert(ResultCache.writeEntry(shape, path), "first writer commits")
      assert(!ResultCache.writeEntry(shape, path), "second writer loses, never overwrites")
      assert(IndexStore.artifactReady(path))
      val (fs, root) = IndexStore.fsOf(s"${IndexStore.root}/result_cache")
      assert(!fs.listStatus(root).exists(_.getPath.getName.contains(".staged-")),
        "loser stages are deleted, not leaked")
      // torn-leftover recovery: a directory WITHOUT its _SUCCESS (a
      // crashed pre-fix overwrite) must not wedge the commit
      val torn = s"${IndexStore.root}/result_cache/torn_entry"
      fs.mkdirs(new org.apache.hadoop.fs.Path(torn, "junk"))
      assert(ResultCache.writeEntry(shape, torn), "torn junk is cleared and the commit lands")
      assert(IndexStore.artifactReady(torn))
      // the junk is moved ASIDE atomically (r16 advice), never deleted
      // in place: a competitor's complete entry racing the repair
      // stays intact on disk, retired later by the age-based sweep
      val aside = fs.listStatus(root)
        .filter(_.getPath.getName.startsWith("torn_entry.torn-"))
      assert(aside.length === 1, "exactly one junk-aside path")
      assert(fs.exists(new org.apache.hadoop.fs.Path(aside.head.getPath, "junk")),
        "the moved-aside junk keeps its contents")
    }
  }

  test("two concurrent misses on one key: both serve correct rows, one committed entry, no stage leaks") {
    withIndexRoot("graft-rc-conc") {
      val dir = tmpDir("graft-rc-conc-data")
      writeTable(dir)
      def shape = graft.Tables(spark, dir, "t")
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .orderBy($"k")
      val expected = shape.collect().map(_.toString).toSeq
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val futures = (1 to 2).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Seq[String]] {
            override def call(): Seq[String] = {
              barrier.await()
              ResultCache.through(spark, shape)._1.collect().map(_.toString).toSeq
            }
          })
        }
        futures.foreach(f => assert(f.get() === expected,
          "every racer serves the correct rows, whichever commit won"))
      } finally pool.shutdown()
      val (fs, root) = IndexStore.fsOf(s"${IndexStore.root}/result_cache")
      val entries = fs.listStatus(root).map(_.getPath.getName)
      assert(!entries.exists(_.contains(".staged-")), "no stage directories leak")
      assert(entries.length === 1, s"exactly one committed entry, got ${entries.toSeq}")
      assert(ResultCache.through(spark, shape)._2, "the committed entry serves the next identical plan")
    }
  }

  test("plans with non-file leaves compute directly and never cache") {
    withIndexRoot("graft-rc-local") {
      val local = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
        .groupBy($"s").agg(count(lit(1)).as("n"))
      assert(!ResultCache.through(spark, local)._2)
      assert(!ResultCache.through(spark, local)._2,
        "a LocalRelation's data is outside the canonicalized string — caching it could serve another frame's rows")
    }
  }
}
