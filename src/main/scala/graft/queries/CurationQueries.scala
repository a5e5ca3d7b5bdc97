package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline (SURVEY.md §2.9 north star):
  * the composed shape a training-data build actually runs — quality
  * gates → deterministic train/val split → per-(lang, split) yield
  * accounting. The building blocks exist individually (t01/t02 quality
  * metrics, t04/d01 dedup); this registers the COMPOSITION under the
  * correctness gate.
  *
  * Scale design:
  *  - the quality gates are narrow per-row projections (no shuffle)
  *    evaluated before anything heavy — the 100-TB filter-early rule;
  *  - the split is a salted md5 hash of the stable doc id — fully
  *    deterministic and reproducible across runs/engines/retries (no
  *    rand(), which breaks task-retry determinism), no shuffle;
  *  - the only exchange is the final low-cardinality aggregate, with
  *    map-side partials.
  */
object CurationQueries {

  /** c01 — quality-gate + 90/10 hash split + yield stats. The split
    * key is the first 15 hex chars of md5(doc_id || salt) — a 60-bit
    * value, identically computable in the DuckDB oracle (`conv` ≡
    * `CAST('0x'... AS BIGINT)`). */
  val c01CorpusCuration: GraftQuery = GraftQuery(
    "c01_corpus_curation",
    (s, dir) => {
      import s.implicits._
      val toks = split(trim($"text"), "\\s+")
      val d = Tables(s, dir, "documents")
        .select($"doc_id", $"lang",
          size(toks).as("n_tok"),
          size(array_distinct(toks)).as("n_uniq"))
      // gates: minimum length + type-token ratio (drops degenerate /
      // boilerplate docs); both are engine-exact integer/ratio math
      val gated = d.where($"n_tok" >= 5 &&
        ($"n_uniq".cast("double") / $"n_tok") >= 0.3)
      val h = conv(
        substring(md5(concat($"doc_id".cast("string"), lit(":graft"))
          .cast("binary")), 1, 15), 16, 10).cast("long")
      gated
        .withColumn("split", when(h % 10 < 9, "train").otherwise("val"))
        .groupBy($"lang", $"split")
        .agg(
          count(lit(1)).as("docs"),
          sum($"n_tok").as("tokens"),
          round(avg($"n_uniq".cast("double") / $"n_tok"), 4).as("avg_ttr"))
        .orderBy($"lang", $"split")
    },
    Some("""WITH d AS (
      |  SELECT doc_id, lang,
      |         len(regexp_split_to_array(trim(text), '\s+'))                AS n_tok,
      |         len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_uniq
      |  FROM documents),
      |g AS (
      |  SELECT *,
      |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 15)
      |              AS BIGINT) AS h
      |  FROM d
      |  WHERE n_tok >= 5 AND CAST(n_uniq AS DOUBLE) / n_tok >= 0.3)
      |SELECT lang,
      |       CASE WHEN h % 10 < 9 THEN 'train' ELSE 'val' END AS split,
      |       count(*)                                         AS docs,
      |       CAST(sum(n_tok) AS BIGINT)                       AS tokens,
      |       round(avg(CAST(n_uniq AS DOUBLE) / n_tok), 4)    AS avg_ttr
      |FROM g
      |GROUP BY lang, split
      |ORDER BY lang, split""".stripMargin),
    "north-star composition: quality gates + deterministic hash split")

  /** c02 — deterministic stratified sampling: exactly k docs per
    * stratum (lang), chosen by salted-md5 hash order with a doc_id
    * tie-break. Unlike `df.sample`/TABLESAMPLE, the selection is a
    * pure function of the data — reproducible across runs, engines,
    * task retries, and partitionings (rand()-based sampling is none
    * of these). Plan: one shuffle on the stratum key, per-stratum
    * rank, bounded output; Catalyst's WindowGroupLimit prunes
    * per-partition before the exchange. At 100 TB swap the window for
    * the bounded-heap TopK aggregator (same contract, O(k) state). */
  val c02StratifiedSample: GraftQuery = GraftQuery(
    "c02_stratified_sample",
    (s, dir) => {
      import s.implicits._
      val k = 20
      val h = conv(
        substring(md5(concat($"doc_id".cast("string"), lit(":sample"))
          .cast("binary")), 1, 15), 16, 10).cast("long")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy(h.asc, $"doc_id".asc)
      Tables(s, dir, "documents")
        .select($"doc_id", $"lang", $"n_chars")
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= k)
        .select($"lang", $"rnk", $"doc_id", $"n_chars")
        .orderBy($"lang", $"rnk")
    },
    Some("""WITH h AS (
      |  SELECT doc_id, lang, n_chars,
      |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 15)
      |              AS BIGINT) AS hv
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, n_chars,
      |         row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rnk
      |  FROM h)
      |SELECT lang, rnk, CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(n_chars AS BIGINT) AS n_chars
      |FROM r WHERE rnk <= 20
      |ORDER BY lang, rnk""".stripMargin),
    "north-star: deterministic stratified sampling (exact per-stratum quotas)")

  val all: Seq[GraftQuery] = Seq(c01CorpusCuration, c02StratifiedSample)
}
