package graft.plans

import graft.SparkSpec
import graft.operators.StatsCatalog
import org.apache.spark.sql.functions._

/** The estimator contract: deterministic Selinger formulas over the
  * ANALYZE stats — sane against actuals on uniform fixtures, honest
  * Nones without stats, rename-transparent, left-outer floored, and
  * conjuncts composed under independence. */
class CardinalityEstimatorSpec extends SparkSpec {
  import spark.implicits._

  private def writeTables(dir: String): Unit = {
    // 1200 fact rows: key uniform over 1..100, flag uniform over 4
    (1L to 1200L).map(i => (i % 100 + 1, s"f${i % 4}", i))
      .toDF("k", "flag", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact.parquet")
    // 100-row dim, unique key
    (1L to 100L).map(i => (i, s"d$i"))
      .toDF("dk", "dname")
      .write.mode("overwrite").parquet(s"$dir/dim.parquet")
  }

  private def estOf(df: org.apache.spark.sql.DataFrame): BigInt =
    CardinalityEstimator.estimateRows(spark, df)
      .getOrElse(fail("estimate must exist"))

  test("estimates track actuals on uniform data (within small factors)") {
    withIndexRoot("graft-card") {
      val dir = tmpDir("graft-card-data")
      writeTables(dir)
      Seq("fact", "dim").foreach(StatsCatalog.ensure(spark, dir, _))
      val f = graft.Tables(spark, dir, "fact")
      val d = graft.Tables(spark, dir, "dim")
      def close(est: BigInt, actual: Long, factor: Long = 2L): Unit =
        assert(est <= actual * factor && est * factor >= BigInt(actual),
          s"est=$est actual=$actual")
      close(estOf(f), 1200L)
      close(estOf(f.where($"flag" === "f1")), 300L)
      close(estOf(f.where($"k" <= 50L)), 600L)
      close(estOf(f.join(d, $"k" === $"dk")), 1200L)
      close(estOf(f.groupBy($"flag").agg(count(lit(1)))), 4L)
      // conjuncts compose multiplicatively (independence)
      close(estOf(f.where($"flag" === "f1" && $"k" <= 50L)), 150L)
      // disjunction: 1-(1-1/4)(1-1/2) = 5/8 -> 750; negation: 3/4 -> 900
      close(estOf(f.where($"flag" === "f1" || $"k" <= 50L)), 750L)
      close(estOf(f.where(!($"flag" === "f1"))), 900L)
      // limit caps
      assert(estOf(f.limit(7)) === BigInt(7))
    }
  }

  test("timestamp ranges estimate through the loader's ts rebuild") {
    withIndexRoot("graft-card-ts") {
      val sf = "/root/testdata/sf0.001"
      StatsCatalog.ensure(spark, sf, "events")
      val ev = graft.Tables(spark, sf, "events")
      val cut = graft.operators.MinMaxManifest.utc("2024-01-16 00:00:00")
      val est = estOf(ev.where($"ts" < lit(cut)))
      val actual = ev.where($"ts" < lit(cut)).count()
      // uniform event times: the span fraction lands close
      assert(est <= actual * 2 && est * 2 >= BigInt(actual),
        s"ts-range est=$est actual=$actual")
    }
  }

  test("left outer floors at the left side; renames stay transparent") {
    withIndexRoot("graft-card-lo") {
      val dir = tmpDir("graft-card-lo-data")
      writeTables(dir)
      Seq("fact", "dim").foreach(StatsCatalog.ensure(spark, dir, _))
      val f = graft.Tables(spark, dir, "fact")
      // a dim filtered to nothing still yields >= |left| under LEFT
      val d = graft.Tables(spark, dir, "dim").where($"dk" <= 1L)
      val lo = f.join(d, $"k" === $"dk", "left")
      assert(estOf(lo) >= BigInt(1200),
        "left outer preserves every left row")
      // alias keeps the underlying column's stats
      val renamed = f.select($"k".as("kk"), $"flag")
        .where($"kk" <= 50L)
      val est = estOf(renamed)
      assert(est >= 400 && est <= 800, s"rename must keep span stats: $est")
    }
  }

  test("un-ANALYZEd leaves and unknown shapes answer None, never a guess") {
    withIndexRoot("graft-card-none") {
      val dir = tmpDir("graft-card-none-data")
      writeTables(dir)
      val f = graft.Tables(spark, dir, "fact")
      assert(CardinalityEstimator.estimateRows(spark, f).isEmpty,
        "no stats -> no estimate")
      StatsCatalog.ensure(spark, dir, "fact")
      assert(CardinalityEstimator.estimateRows(spark, f).isDefined)
      // a full outer join stays outside the algebra -> None (honest)
      val d = graft.Tables(spark, dir, "dim")
      assert(CardinalityEstimator
        .estimateRows(spark, f.join(d, $"k" === $"dk", "full")).isEmpty)
      // a union whose OTHER branch lacks stats is also None — the sum
      // formula needs every branch, no silent guessing
      assert(CardinalityEstimator
        .estimateRows(spark, f.union(d.select($"dk", $"dname", $"dk"))).isEmpty)
    }
  }

  test("union sums branches; rollup sums lattice branches; semi/anti complement") {
    withIndexRoot("graft-card-r13") {
      val dir = tmpDir("graft-card-r13-data")
      writeTables(dir)
      Seq("fact", "dim").foreach(StatsCatalog.ensure(spark, dir, _))
      val f = graft.Tables(spark, dir, "fact")
      val d = graft.Tables(spark, dir, "dim")
      // UNION ALL = branch sum; head-branch env survives, so a filter
      // ABOVE the union still uses the first branch's column stats
      assert(estOf(f.union(f)) === BigInt(2400))
      assert(estOf(f.union(f).where($"flag" === "f1")) === BigInt(600),
        "head-branch ndv(flag)=4 -> 2400/4 under uniformity")
      // ROLLUP(flag, k): min(1200, 4*100) + min(1200, 4) + 1 = 405
      assert(estOf(f.rollup($"flag", $"k").agg(count(lit(1)))) === BigInt(405))
      // fact ndv(k)=100 ⊆ dim ndv(dk)=100: semi keeps all, anti none
      assert(estOf(f.join(d, $"k" === $"dk", "left_semi")) === BigInt(1200))
      assert(estOf(f.join(d, $"k" === $"dk", "left_anti")) === BigInt(0))
      // dim filtered to 1/4 span: ndv scales with rows in the catalog?
      // no — ndv is the TABLE's; shrink the right side via a distinct
      // subset table instead: semi against dim half = half the fact
      val half = graft.Tables(spark, dir, "dim").where($"dk" <= 50L)
      // filter drops rows but keeps the key's ndv env — the semi
      // formula reads ndv, not rows, so this pins WHICH stat it uses
      assert(estOf(f.join(half, $"k" === $"dk", "left_semi")) === BigInt(1200))
      // a window never changes cardinality; the child's stats survive
      // through it (the filter above still uses flag's ndv)
      import org.apache.spark.sql.expressions.{Window => W}
      val windowed = f.withColumn("rn",
        row_number().over(W.partitionBy($"k").orderBy($"payload")))
      assert(estOf(windowed) === BigInt(1200))
      assert(estOf(windowed.where($"flag" === "f1")) === BigInt(300))
      // DISTINCT = group-by in disguise: dropDuplicates(k) -> ndv(k),
      // full distinct -> capped independence product
      assert(estOf(f.dropDuplicates("k")) === BigInt(100))
      assert(estOf(f.select($"k", $"flag").distinct()) === BigInt(400))
      // set ops are declared upper bounds over DISTINCT rows: both
      // sides dedup via the ndv product before the min/left bound —
      // 1200 fact rows with ndv(k)=100 bound at 100, not 1200
      val ks = f.select($"k")
      val dks = d.select($"dk")
      assert(estOf(ks.intersect(dks)) === BigInt(100),
        "intersect bounded by the smaller DISTINCT side")
      assert(estOf(ks.except(dks)) === BigInt(100),
        "except bounded by the left DISTINCT side")
    }
  }
}
