package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reconciliation contract: identical inputs match on every
  * bucket under ANY partitioning/order, a single changed row is
  * pinpointed to exactly its bucket, and the digest triple catches
  * the classes any single digest is blind to. */
class TableFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val F = TableFingerprint
  private def fp(df: org.apache.spark.sql.DataFrame) =
    F.fingerprint(df, col("s"), 16)
  private def rows(n: Int) = (0 until n).map(i => s"row-$i").toDF("s")

  test("identical content matches on every bucket, independent of partitioning") {
    val a = rows(500)
    // same rows, different physical layout and order
    val b = rows(500).repartition(7).sortWithinPartitions(desc("s"))
    val d = F.diff(fp(a), fp(b)).collect()
    assert(d.nonEmpty && d.forall(_.getAs[Long]("is_match") == 1L))
  }

  test("a single changed row mismatches exactly its own bucket") {
    val a = rows(500)
    val b = a.select(when(col("s") === "row-123", lit("row-123x"))
      .otherwise(col("s")).as("s"))
    val d = F.diff(fp(a), fp(b))
      .where(col("is_match") === 0L).collect()
    val hit = d.map(_.getAs[Long]("bucket")).toSet
    val expected = Seq("row-123", "row-123x").map { s =>
      Seq(s).toDF("s").select(
        (graft.functions.DetHash.hash60(col("s"), F.Salt) % 16).as("b"))
        .head().getLong(0)
    }.toSet
    assert(hit === expected,
      s"mismatch must pinpoint the changed row's buckets: $hit vs $expected")
  }

  test("an even-multiplicity edit (row duplicated twice) is XOR-blind but still caught") {
    val a = rows(200)
    val dup = Seq("row-7", "row-7").toDF("s")
    val b = a.unionAll(dup)
    // the xr digest alone cannot see it: x ⊕ x = 0
    val bucket = Seq("row-7").toDF("s").select(
      (graft.functions.DetHash.hash60(col("s"), F.Salt) % 16).as("b"))
      .head().getLong(0)
    val xa = fp(a).where(col("bucket") === bucket).head()
    val xb = fp(b).where(col("bucket") === bucket).head()
    assert(xa.getAs[Long]("xr") === xb.getAs[Long]("xr"),
      "fixture must exercise the XOR-blind class")
    // but the triple (n and sm both moved) catches it
    val d = F.diff(fp(a), fp(b)).where(col("is_match") === 0L)
      .collect().map(_.getAs[Long]("bucket")).toSet
    assert(d === Set(bucket))
  }

  test("a bucket present on only one side reads as empty and mismatches") {
    // tiny input: some of the 16 buckets exist on one side only
    val a = rows(3)
    val b = rows(5)
    val d = F.diff(fp(a), fp(b)).collect()
    val oneSided = d.filter(r => r.getAs[Long]("n_a") == 0L ||
      r.getAs[Long]("n_b") == 0L)
    assert(oneSided.nonEmpty && oneSided.forall(_.getAs[Long]("is_match") == 0L))
    assert(d.forall(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b") > 0L))
  }
}
