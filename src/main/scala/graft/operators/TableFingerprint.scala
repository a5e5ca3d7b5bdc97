package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-fingerprint RECONCILIATION — answer "are these two copies of
  * a table identical, and if not, WHERE do they differ?" with one
  * scan per side and a bucket-count-sized exchange, never a row-level
  * compare. The operation every replicated / migrated / cloned
  * lakehouse runs after a copy, a backfill, or an engine migration
  * (Merkle-style digest trees are the public pattern — Cassandra
  * repair, DynamoDB global-table reconciliation; this is the
  * flattened one-level form, and the bucket key is a hash PREFIX, so
  * a mismatched bucket re-scans only rows hashing into it — the
  * narrowing recursion is one more call with a finer modulus over
  * `fp` of just those rows).
  *
  * Per row: fp = [[graft.functions.DetHash.hash60]] of a canonical
  * row rendering (caller-supplied — pick stable columns; the salted
  * md5 is the SAME arithmetic in Spark and DuckDB, so the oracle
  * replays digests bit-for-bit). Per bucket (fp mod B): three
  * ORDER-INDEPENDENT digests that need no sort and survive any
  * partitioning —
  *  - `n`   row count (catches pure cardinality drift),
  *  - `xr`  bit_xor of fps (order-free, overflow-free; blind to
  *          DUPLICATED rows — a row added twice XORs to zero, which
  *          is why it never travels alone),
  *  - `sm`  sum of fp mod 100003 (catches the XOR-invisible
  *          even-multiplicity edits; the small modulus keeps the
  *          BIGINT sum exact to ~9e13 rows per bucket — no engine
  *          HUGEINT divergence).
  * A bucket matches iff all three agree. False-match probability is
  * ~2⁻⁶⁰ per differing row pair on xr alone; the triple makes the
  * practical answer "identical or pinpointed".
  *
  * Scale shape: each side is scan → narrow projection → one hash
  * aggregate on a B-cardinality key (map-side partials collapse
  * everything; the exchange carries ≤ B rows per side); the diff is
  * a B-row full-outer join. At 100 TB the comparison IO is two
  * corpus scans and kilobytes of shuffle — and the scans push down
  * to only the fingerprinted columns. */
object TableFingerprint {

  val Salt = "tfp"

  /** Per-bucket digest of `df` under the canonical row rendering
    * `row`: (bucket, n, xr, sm). */
  def fingerprint(df: DataFrame, row: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "need a positive bucket count")
    df.select(graft.functions.DetHash.hash60(row, Salt).as("_fp"))
      .select(col("_fp"), (col("_fp") % buckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(_fp)").as("xr"),
        sum(col("_fp") % 100003L).as("sm"))
  }

  /** Bucket-level diff of two fingerprints: one row per bucket seen
    * on either side — (bucket, n_a, n_b, is_match) with absent
    * buckets read as empty (n=0) and `is_match` as 0/1 BIGINT (all
    * three digests must agree). */
  def diff(fa: DataFrame, fb: DataFrame): DataFrame = {
    val a = fa.select(col("bucket"), col("n").as("n_a"),
      col("xr").as("xr_a"), col("sm").as("sm_a"))
    val b = fb.select(col("bucket"), col("n").as("n_b"),
      col("xr").as("xr_b"), col("sm").as("sm_b"))
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(col("n_a") <=> col("n_b") && col("xr_a") <=> col("xr_b") &&
          col("sm_a") <=> col("sm_b"), 1L).otherwise(0L).as("is_match"))
  }
}
