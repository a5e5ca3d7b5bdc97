package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming leg of incremental dedup (D3, the d05 shape as a
  * continuous pipeline): each micro-batch of incoming documents is
  * checked against the STANDING corpus index with the asymmetric
  * banded join — batch ⋈ index on the prefix bucket, exact token-set
  * Jaccard verify — then novel documents' index entries are appended
  * so later batches dedup against everything seen so far. This is the
  * daily-crawl ingest shape run continuously: per batch the join
  * shuffles O(batch) rows, never O(corpus), and the corpus side is a
  * persisted bucket-keyed parquet index (at scale: bucketed/partitioned
  * by the band key so index lookups prune to matching buckets).
  *
  * foreachBatch is the right tool (not a stream-stream join): the
  * index is a slowly-growing BATCH table the stream joins against,
  * and appends within the same transaction boundary as the decision
  * output — Structured Streaming replays the batch on failure, and
  * both writes are idempotent per (batch doc_id).
  *
  * Batch/stream parity: the per-batch logic is expression-for-
  * expression the d05 oracle semantics (bucket = substr(text,1,20),
  * Jaccard over distinct tokens ≥ 0.6, best match by (J desc, id)) —
  * pinned by the spec's cross-check against the batch formulation.
  */
object StreamingDedup {

  val indexSchema: StructType = StructType(Seq(
    StructField("corpus_id", LongType),
    StructField("bucket", StringType),
    StructField("toks", ArrayType(StringType))))

  private def indexed(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol),
      substring(col("text"), 1, 20).as("bucket"),
      array_distinct(split(trim(col("text")), "\\s+")).as("toks"))

  /** Read the standing index, tolerating the empty first batch. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val hasData = {
      val d = new java.io.File(indexDir)
      d.isDirectory && d.listFiles() != null &&
        d.listFiles().exists(_.getName.endsWith(".parquet"))
    }
    if (hasData) spark.read.schema(indexSchema).parquet(indexDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
  }

  /** One micro-batch: returns (decisions, novelIndexEntries).
    * Decision rows: (doc_id, dup_of nullable, jaccard nullable). */
  def dedupBatch(batch: DataFrame, index: DataFrame): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    import spark.implicits._
    val in = indexed(batch, "doc_id")
    val idx = index.select($"corpus_id", $"bucket", $"toks".as("ctoks"))
    val matches = in.join(idx, Seq("bucket"))
      .select($"doc_id", $"corpus_id",
        round(size(array_intersect($"toks", $"ctoks")).cast("double")
          / size(array_union($"toks", $"ctoks")), 4).as("j"))
      .where($"j" >= 0.6)
    val best = matches
      .groupBy($"doc_id")
      .agg(max_by(struct($"corpus_id", $"j"), struct($"j", -$"corpus_id")).as("m"))
      .select($"doc_id", $"m.corpus_id".as("dup_of"), $"m.j".as("jaccard"))
    val decisions = in.select($"doc_id")
      .join(best, Seq("doc_id"), "left")
    val novel = in.join(best, Seq("doc_id"), "left_anti")
      .select($"doc_id".as("corpus_id"), $"bucket", $"toks")
    (decisions, novel)
  }

  /** Wire a streaming (doc_id, text) source through per-batch dedup:
    * decisions append to `outDir`, novel docs' entries to `indexDir`. */
  def run(docs: DataFrame, indexDir: String, outDir: String,
      checkpoint: String): StreamingQuery = {
    docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val (decisions, novel) = dedupBatch(batch, readIndex(spark, indexDir))
        // decisions first, then the index append: a replayed batch
        // re-derives the same decisions (novel rows are keyed by
        // doc_id, so re-appends are dedupable downstream)
        decisions.write.mode("append").parquet(outDir)
        novel.write.mode("append").parquet(indexDir)
        ()
      }
      .start()
  }
}
