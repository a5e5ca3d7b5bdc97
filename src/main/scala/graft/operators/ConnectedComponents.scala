package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * operator a dedup pipeline needs between near-dup PAIR detection
  * (d01/t04/t05) and canonical-document selection: pairs chain
  * (a~b, b~c ⇒ {a,b,c}), so keepers must come from components, not
  * pairs.
  *
  * Algorithm: every vertex starts labeled with itself; each round a
  * vertex takes the min of its own label and its neighbors' labels;
  * stop when no label changes. Converges in O(diameter) rounds —
  * near-dup clusters are small and dense, so typically 2–3.
  *
  * Scale shape per round: one shuffle of (edge endpoint, label) pairs
  * + one min-aggregate — primitive longs only, Σ cost O(E) per round.
  * The driver-side loop holds only a changed-row COUNT, never data;
  * each round's result is checkpointed to cut the growing lineage
  * (iterative DataFrame plans otherwise re-plan the whole history
  * each round).
  *
  * Checkpoint reliability is the caller's deployment choice:
  * `localCheckpoint` (default) stores blocks on executors — fast, but
  * a lost executor kills the job, acceptable only in local mode or
  * for restartable jobs. Passing `checkpointDir` switches to RELIABLE
  * checkpoints — an explicit parquet write-then-read into that
  * (HDFS/object-store) path, which survives executor loss: the
  * 100-TB-cluster option. Deliberately NOT `Dataset.checkpoint()`:
  * that would mutate the session-global SparkContext checkpoint dir
  * (unsettable afterwards) and leave one full copy of the labels per
  * round on disk forever (Spark never cleans reliable checkpoints by
  * default). The explicit files are operator-owned — each round's
  * intermediate is deleted as soon as the next round is materialized,
  * so at most two label snapshots exist at any moment and only the
  * FINAL one (which the returned DataFrame reads) outlives the call.
  */
object ConnectedComponents {

  /** @param edges two long columns (src, dst), undirected semantics.
    * @param checkpointDir fault-tolerant checkpoint location; None ⇒
    *        executor-local checkpoints (local-mode fast path).
    * @return (id, component) — component = min vertex id reachable. */
  def components(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // each invocation snapshots under its own unique subdirectory —
    // two concurrent components() calls sharing a checkpointDir must
    // never overwrite or delete each other's files
    val runDir = checkpointDir.map(d =>
      s"$d/cc-${java.util.UUID.randomUUID().toString.take(12)}")
    var ckptSeq = 0
    var lastLabelPath: Option[String] = None
    def delete(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      ()
    }
    // reliable mode: eager parquet write + read-back (lineage cut that
    // survives executor loss, no SparkContext-global checkpoint state)
    def persistCut(df: DataFrame): DataFrame = runDir match {
      case None => df.localCheckpoint()
      case Some(dir) =>
        val path = s"$dir/ckpt-$ckptSeq"
        ckptSeq += 1
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
    }
    def persistLabels(df: DataFrame): DataFrame = {
      val cut = persistCut(df)
      runDir.foreach { dir =>
        // the new snapshot is fully materialized (eager write), so the
        // previous round's file is dead — delete it now, bounding the
        // operator's footprint at two label snapshots
        lastLabelPath.foreach(delete)
        lastLabelPath = Some(s"$dir/ckpt-${ckptSeq - 1}")
      }
      cut
    }
    try {
      val und = persistCut(
        edges.select(col(src).as("u"), col(dst).as("v"))
          .unionAll(edges.select(col(dst).as("u"), col(src).as("v")))
          .distinct())
      var labels = persistLabels(
        und.select($"u".as("id")).distinct()
          .select($"id", $"id".as("component")))
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIter) {
        val neighborMin = und
          .join(labels.withColumnRenamed("id", "v"), "v")
          .groupBy($"u".as("id"))
          .agg(min($"component").as("nmin"))
        val next = labels.join(neighborMin, Seq("id"), "left")
          .select($"id",
            least($"component", coalesce($"nmin", $"component")).as("component"),
            ($"nmin" < $"component").as("chg"))
        val materialized = persistLabels(next)
        changed = materialized.where($"chg").count()
        labels = materialized.drop("chg")
        iter += 1
      }
      // the edges snapshot is only read during the loop; the returned
      // labels read solely from their own (final) snapshot
      runDir.foreach(dir => delete(s"$dir/ckpt-0"))
      // stale labels are silently WRONG components — fail loudly instead
      if (changed > 0)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds " +
            s"($changed labels still changing — graph diameter exceeds the " +
            "iteration cap); raise maxIter")
      labels
    } catch {
      case e: Throwable =>
        // nothing escapes a failed call — the run's whole subdirectory
        // goes, honoring "only the final snapshot outlives the call"
        runDir.foreach(delete)
        throw e
    }
  }
}
