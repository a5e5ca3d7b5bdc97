package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE-AUDIT-PUBLISH — the ingestion gate every table format
  * recommends (Iceberg's WAP / Delta's staged-commit pattern, the
  * public idea): a batch lands in a STAGING area outside the table,
  * the data-quality suite ([[ConstraintCheck]]) audits it there, and
  * only a passing batch is PUBLISHED into the versioned layout
  * ([[MinMaxManifest]] manifest + snapshot log). A failing batch
  * never becomes visible to any reader — including time travel —
  * and leaves a rejection record instead of rows.
  *
  * Why staging must live OUTSIDE the layout directory: the manifest
  * layer deliberately self-heals unmanifested files back in
  * (torn-append repair) and the snapshot layer logs them under a
  * repair snapshot — exactly the right behavior for a crashed
  * APPEND, and exactly wrong for an unaudited batch. Quarantine is
  * physical separation, not a flag.
  *
  * Publish here re-drives [[MinMaxManifest.appendBatch]] over the
  * audited staged rows — one O(batch) copy that buys the append
  * path's existing crash discipline (data → manifest → snapshot with
  * self-healing at each seam). A production format publishes the
  * staged FILES by metadata swap instead; the flow and its
  * guarantees are the same.
  *
  * Crash story: staging is overwrite-mode and recorded nowhere, so a
  * crash before the publish decision leaves only an orphan staging
  * dir — [[recover]] discards it (the [[DeletionVectors]] rule: the
  * live table never stopped being authoritative). A crash during
  * publish is appendBatch's own healed territory. */
object WriteAuditPublish {

  val Table = "events_wap"

  private def artifact(dir: String, leaf: String): String =
    s"${IndexStore.root}/${IndexStore.fingerprint(dir, "events")}/$leaf"
  def stagingPath(dir: String): String = artifact(dir, s"${Table}_staging")
  def auditLogPath(dir: String): String = artifact(dir, s"${Table}_audit_log")

  private def ready(p: String): Boolean = IndexStore.artifactReady(p)

  /** Discard any orphan staging (a batch that never reached its
    * publish decision). */
  def recover(dir: String): Unit = IndexStore.removeArtifact(stagingPath(dir))

  /** Whether the WAP table's base layout exists (the registered
    * query's build guard — readiness rules are package-private). */
  def tableReady(dir: String): Boolean =
    ready(MinMaxManifest.layoutPath(dir, Table))

  /** Stage → audit → publish-or-reject. Returns the audit report
    * with a `published` verdict column; the report is also appended
    * to the audit log (one tiny file per batch — the ops trail). */
  def stageAndPublish(s: SparkSession, dir: String, batch: DataFrame,
      suite: Seq[ConstraintCheck.Constraint],
      batchTag: String): DataFrame = {
    recover(dir)
    val stage = stagingPath(dir)
    batch.write.mode("overwrite").parquet(stage)
    val staged = s.read.parquet(stage)
    // the report is MATERIALIZED before staging is dropped — the
    // lazy report plan reads the staged files, and re-executing it
    // after the cleanup below would read deleted paths
    val rows = ConstraintCheck.run(staged, suite).collect()
    val pass = rows.forall(_.getLong(3) == 1L)
    if (pass) MinMaxManifest.appendBatch(s, dir, staged, table = Table)
    IndexStore.removeArtifact(stage)
    import s.implicits._
    val verdict = s.createDataset(rows.toIndexedSeq.map(r =>
        (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3),
          batchTag, if (pass) 1L else 0L)))
      .toDF("check", "col", "metric", "passed", "batch", "published")
    verdict.coalesce(1).write.mode("append").parquet(auditLogPath(dir))
    verdict
  }
}
