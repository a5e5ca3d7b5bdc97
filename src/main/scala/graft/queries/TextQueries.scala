package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators (SURVEY.md §2.9 D5) over the `documents`
  * testdata table — the LLM-training-data-pipeline surface: token
  * counting, quality scoring, language-ID heuristics, document
  * fingerprinting, and n-gram Jaccard near-dup detection.
  *
  * Everything is built-in Catalyst expressions (split / higher-order
  * array functions / md5) — zero UDFs, so the whole stage codegens and
  * the only shuffles are the final groupBys. Oracle parity notes:
  *  - token splits use the same regex (`\s+` over trimmed text`) on
  *    both engines;
  *  - ratios are single divisions of exact integers → bit-identical
  *    across engines; fingerprints are md5 hex (engine-independent);
  *  - langid scoring uses occurrence counts via split-length
  *    (integer math only) so argmax is deterministic.
  *
  * 100 TB notes: every query here is a narrow per-row projection
  * followed by one hash aggregate — embarrassingly parallel, no
  * skew-prone keys (lang/source are low-cardinality but the partial
  * aggregation collapses rows map-side before the shuffle). The
  * Jaccard near-dup query is BANDED (self-join on a prefix bucket),
  * never all-pairs.
  */
object TextQueries {
  private type QFn = (SparkSession, String) => DataFrame

  private def q(name: String, doc: String, oracle: String)(fn: QFn) =
    GraftQuery(name, fn, Some(oracle), doc)

  /** Whitespace tokenization shared by all queries (P-analog of the
    * reference's shared cleaning projection idiom). */
  private def tokens(c: Column): Column = graft.functions.TextStats.tokens(c)

  /** D5 — corpus token/char statistics per language. */
  val t01TokenStats: GraftQuery = q(
    "t01_token_stats",
    "D5 token counting: per-lang corpus stats",
    """SELECT lang,
      |       count(*)                                                             AS docs,
      |       CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)   AS tokens,
      |       CAST(sum(n_chars) AS BIGINT)                                         AS chars,
      |       round(avg(n_chars), 2)                                               AS avg_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    Tables(s, dir, "documents")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(size(tokens($"text"))).as("tokens"),
        sum($"n_chars").as("chars"),
        round(avg($"n_chars"), 2).as("avg_chars"))
      .orderBy($"lang")
  }

  /** D5 — per-doc quality scoring (type-token ratio, stopword ratio)
    * aggregated per source. Ratios are int/int single divisions →
    * engine-exact; only the avg() is rounded. */
  val t02QualityScore: GraftQuery = q(
    "t02_quality_score",
    "D5 quality scoring: TTR + stopword ratio per source",
    """WITH d AS (
      |  SELECT source,
      |         regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT source,
      |         len(toks)                                                       AS n_tok,
      |         len(list_distinct(toks))                                        AS n_uniq,
      |         len(list_filter(toks, x -> x IN ('the', 'a')))                  AS n_stop
      |  FROM d)
      |SELECT source,
      |       count(*)                                              AS docs,
      |       round(avg(CAST(n_uniq AS DOUBLE) / n_tok), 4)         AS avg_ttr,
      |       round(avg(CAST(n_stop AS DOUBLE) / n_tok), 4)         AS avg_stop_ratio,
      |       CAST(sum(n_tok) AS BIGINT)                            AS tokens
      |FROM m
      |GROUP BY source
      |ORDER BY source""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"source", tokens($"text").as("toks"))
      .select(
        $"source",
        size($"toks").as("n_tok"),
        size(array_distinct($"toks")).as("n_uniq"),
        size(filter($"toks", x => x.isin("the", "a"))).as("n_stop"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("docs"),
        round(avg($"n_uniq".cast("double") / $"n_tok"), 4).as("avg_ttr"),
        round(avg($"n_stop".cast("double") / $"n_tok"), 4).as("avg_stop_ratio"),
        sum($"n_tok").as("tokens"))
      .orderBy($"source")
  }

  /** D5 — language-ID by marker-substring occurrence counts (n-gram
    * heuristic, integer math only: occurrences = split-parts − 1, so
    * the argmax is bit-deterministic on both engines). On the
    * synthetic corpus this classifies topic-markers, not real
    * languages — the operator shape (per-row scoring + argmax CASE +
    * rollup) is what carries to a real profile table. */
  val t03LangId: GraftQuery = q(
    "t03_langid_heuristic",
    "D5 language-ID heuristic: marker n-gram scoring + argmax",
    """WITH s AS (
      |  SELECT lang,
      |         len(string_split(text, 'the'))   - 1 AS s_the,
      |         len(string_split(text, 'data'))  - 1 AS s_data,
      |         len(string_split(text, 'query')) - 1 AS s_query
      |  FROM documents),
      |p AS (
      |  SELECT lang,
      |         CASE WHEN s_the >= s_data AND s_the >= s_query THEN 'm_the'
      |              WHEN s_data >= s_query                     THEN 'm_data'
      |              ELSE 'm_query' END AS predicted
      |  FROM s)
      |SELECT lang, predicted, count(*) AS docs
      |FROM p
      |GROUP BY lang, predicted
      |ORDER BY lang, predicted""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    def occ(marker: String): Column =
      size(split($"text", java.util.regex.Pattern.quote(marker), -1)) - 1
    Tables(s, dir, "documents")
      .select(
        $"lang",
        occ("the").as("s_the"), occ("data").as("s_data"), occ("query").as("s_query"))
      .select(
        $"lang",
        when($"s_the" >= $"s_data" && $"s_the" >= $"s_query", "m_the")
          .when($"s_data" >= $"s_query", "m_data")
          .otherwise("m_query").as("predicted"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("docs"))
      .orderBy($"lang", $"predicted")
  }

  /** D5/D3 — document fingerprinting: md5 over a normalized prefix,
    * then collision groups = near-duplicate clusters. md5 hex is
    * engine-independent, so the oracle matches exactly. */
  val t04Fingerprint: GraftQuery = q(
    "t04_fingerprint_dedup",
    "D5/D3 md5 fingerprint + duplicate-group detection",
    """SELECT md5(substr(text, 1, 40))  AS fp,
      |       count(*)                  AS docs,
      |       CAST(min(doc_id) AS BIGINT) AS keeper
      |FROM documents
      |GROUP BY 1
      |HAVING count(*) > 1
      |ORDER BY fp""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    Tables(s, dir, "documents")
      .groupBy(md5(substring($"text", 1, 40).cast("binary")).as("fp"))
      .agg(count(lit(1)).as("docs"), min($"doc_id").as("keeper"))
      .where($"docs" > 1)
      .orderBy($"fp")
  }

  /** D3 — n-gram (token-set) Jaccard near-dup pairs, BANDED by a
    * text-prefix bucket so the self-join is bucket-local (at 100 TB
    * this is the LSH-band pattern: candidates only within a bucket,
    * never an all-pairs cross join). Jaccard = |∩|/|∪| of distinct
    * token sets — single int/int division, engine-exact. */
  val t05JaccardPairs: GraftQuery = q(
    "t05_jaccard_near_dup",
    "D3 banded token-set Jaccard near-duplicate pairs",
    """WITH d AS (
      |  SELECT doc_id,
      |         substr(text, 1, 20)                               AS bucket,
      |         list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
      |  FROM documents)
      |SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
      |       CAST(b.doc_id AS BIGINT) AS doc_b,
      |       round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |             / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
      |FROM d a JOIN d b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val d = Tables(s, dir, "documents")
      .select(
        $"doc_id",
        substring($"text", 1, 20).as("bucket"),
        array_distinct(tokens($"text")).as("toks"))
    val a = d.select($"doc_id".as("doc_a"), $"bucket", $"toks".as("toks_a"))
    val b = d.select($"doc_id".as("doc_b"), $"bucket", $"toks".as("toks_b"))
    a.join(b, Seq("bucket"))
      .where($"doc_a" < $"doc_b")
      .select(
        $"doc_a", $"doc_b",
        round(
          size(array_intersect($"toks_a", $"toks_b")).cast("double") /
            size(array_union($"toks_a", $"toks_b")), 4).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** D5 — BPE-style token counting: regex pre-tokenization (letter
    * runs / digit runs / single punctuation — the coarse shape of
    * GPT-style pre-tokenizers) counted per doc, aggregated per lang.
    * ASCII-only classes so the Java and DuckDB regex dialects agree. */
  val t06BpeTokens: GraftQuery = GraftQuery(
    "t06_bpe_token_count",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"lang",
          size(regexp_extract_all($"text",
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe"))
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("docs"),
          sum($"n_bpe").as("bpe_tokens"),
          max($"n_bpe").as("max_bpe"))
        .orderBy($"lang")
    },
    Some("""SELECT lang,
      |       count(*)                                                              AS docs,
      |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
      |       CAST(max(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS max_bpe
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin),
    "D5 BPE-ish regex token counting")

  /** D5/D3 — winnowing fingerprints (rolling Rabin–Karp k-gram hashes
    * + sliding-window minima, JIT'd in HashSketch): near-dup pairs =
    * docs sharing a fingerprint (inverted-index join on the
    * fingerprint — the scalable grouping), verified by fingerprint
    * containment ≥ 0.8. The mod-P hash family is BIGINT-expressible,
    * so the DuckDB oracle recomputes every fingerprint (direct k-gram
    * hashes + windowed min — rolling is only the Spark-side O(n)
    * evaluation strategy) and replays the whole pipeline. */
  val t07Winnowing: GraftQuery = GraftQuery(
    "t07_winnow_fingerprint",
    (s, dir) => {
      import s.implicits._
      import graft.functions.HashSketch
      // Fingerprints as EXPLODED primitive (doc_id, fp) pairs straight
      // out of the typed flatMap — every downstream shuffle carries two
      // longs per row. (The previous array-column formulation shuffled
      // boxed Seq[Long] fingerprint sets through three stages and was
      // 4× slower end to end.)
      // widen the scan first (Par.widen, guide §2.6): the sub-MB
      // single-file corpus plans as ONE split, and the winnow flatMap
      // lineage fuses into EVERY downstream map stage (the broadcast
      // semi-joins keep cfps map-side), so uncached recompute ran the
      // whole query serially — measured every t07 stage at tasks=1
      val fps = graft.functions.Par.widen(
          Tables(s, dir, "documents").select($"doc_id", $"text"))
        .as[(Long, String)]
        .flatMap { case (id, t) =>
          HashSketch.winnow(t).iterator.map(f => (id, f)) }
        .toDF("doc_id", "fp")
      // (re-measured in r16 AFTER the widening: an fp-keyed
      // repartition+MEMORY_AND_DISK persist of fps still lost badly —
      // 2.13 s → 4.78 s min-of-3 — the cache write + the lost
      // scan↔consumer pipelining cost more than five 32-way winnow
      // recomputes; the earlier rejection of a persist here stands.)
      // inverted index: docs sharing a RARE fingerprint become
      // candidate pairs. Document frequency is counted FIRST (count is
      // an O(1) aggregation buffer) and the 2..10 band restricts
      // postings via a semi-join BEFORE any collect_list — so the
      // grouped posting list is ≤ 10 elements by construction and a
      // boilerplate fingerprint shared by millions of docs never
      // materializes a million-element buffer. The df ≤ 10 cap
      // (standard winnowing-index hygiene) also bounds the pair
      // fan-out to C(10,2) per fingerprint. (Two r16 variants measured
      // SLOWER and were rejected: a count-window df in the
      // collect_list's own exchange — 2.0 s → 3.3 s, WindowExec
      // full-sorts the posting mass while this hash aggregate reduces
      // map-side — and a MEMORY_AND_DISK persist of fps — 2.4 s →
      // 3.7 s, the JIT'd winnow flatMap recompute is cheaper than the
      // cache write + three columnar reads at two-long row width.)
      val rare = fps
        .groupBy($"fp").agg(count(lit(1)).as("df"))
        .where($"df".between(2, 10))
        .select($"fp")
      val cands = fps
        .join(rare, Seq("fp"), "left_semi")
        .groupBy($"fp").agg(collect_list($"doc_id").as("docs"))
        .select($"docs").as[Seq[Long]]
        .flatMap { docs =>
          val sorted = docs.sorted
          for {
            i <- sorted.indices.iterator
            j <- (i + 1) until sorted.length
          } yield (sorted(i), sorted(j))
        }
        .toDF("doc_a", "doc_b")
        .dropDuplicates("doc_a", "doc_b")
      // exact containment over the FULL fingerprint sets (no df cap),
      // computed relationally: |A∩B| = matching (fp) rows after the
      // candidate pair is joined back to both docs' postings; set
      // sizes come from a per-doc count. All joins/aggregates carry
      // primitive longs only, and a broadcast semi-join prunes the
      // corpus-wide fingerprint set to candidate docs map-side (same
      // candidate-bounded verify rule as d01).
      val candDocs = cands.select($"doc_a".as("doc_id"))
        .unionAll(cands.select($"doc_b".as("doc_id"))).distinct()
      val cfps = fps.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      val sizes = cfps.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val inter = cands
        .join(cfps.select($"doc_id".as("doc_a"), $"fp"), "doc_a")
        .join(cfps.select($"doc_id".as("doc_b"), $"fp"), Seq("doc_b", "fp"))
        .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
        .join(sizes.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
        .select($"doc_a", $"doc_b",
          ($"inter".cast("double") / least($"na", $"nb")).as("containment"))
        .where($"containment" >= 0.8)
        .select($"doc_a", $"doc_b", round($"containment", 4).as("containment"))
        .orderBy($"doc_a", $"doc_b")
    },
    // Oracle: per-doc winnowing fingerprints rebuilt from scratch —
    // k-gram hash = diffuse(polyHash(substr(text, pos, 8))) with
    // polyHash/diffuse inlined as mod-1000000007 BIGINT arithmetic
    // (identical integer sequences to HashSketch); window minima via
    // min() OVER 6-row frames; then the same rare-fp candidate +
    // containment pipeline. k=8, w=6 mirror HashSketch.winnow defaults.
    Some("""WITH d AS (
      |  SELECT doc_id, text, length(text) AS len FROM documents),
      |km AS (
      |  SELECT doc_id, pos, len, ((q*q + q) % 1000000007) AS m
      |  FROM (
      |    SELECT doc_id, pos, len,
      |           list_reduce(
      |             list_transform(generate_series(0, 7),
      |               j -> CAST(ascii(text[pos + j]) AS BIGINT)),
      |             (h, c) -> (h*131 + c) % 1000000007) AS q
      |    FROM (SELECT doc_id, text, len,
      |                 unnest(generate_series(1, len - 7)) AS pos
      |          FROM d WHERE len >= 8))),
      |regular AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id, pos, len,
      |           min(m) OVER (PARTITION BY doc_id ORDER BY pos
      |                        ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS fp
      |    FROM km WHERE len >= 14)
      |  WHERE pos <= len - 12),
      |small AS (
      |  SELECT doc_id, min(m) AS fp FROM km
      |  WHERE len BETWEEN 8 AND 13 GROUP BY doc_id),
      |tiny AS (
      |  SELECT doc_id, ((q*q + q) % 1000000007) AS fp
      |  FROM (
      |    SELECT doc_id,
      |           CASE WHEN len = 0 THEN 0
      |                ELSE list_reduce(
      |                  list_transform(generate_series(1, len),
      |                    i -> CAST(ascii(text[i]) AS BIGINT)),
      |                  (h, c) -> (h*131 + c) % 1000000007) END AS q
      |    FROM d WHERE len < 8)),
      |fpsets AS (
      |  SELECT doc_id, fp FROM regular
      |  UNION ALL SELECT doc_id, fp FROM small
      |  UNION ALL SELECT doc_id, fp FROM tiny),
      |sizes AS (SELECT doc_id, count(*) AS n FROM fpsets GROUP BY doc_id),
      |rare AS (
      |  SELECT fp FROM fpsets GROUP BY fp
      |  HAVING count(*) BETWEEN 2 AND 10),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM (SELECT f.doc_id, f.fp FROM fpsets f JOIN rare r ON f.fp = r.fp) a
      |  JOIN (SELECT f.doc_id, f.fp FROM fpsets f JOIN rare r ON f.fp = r.fp) b
      |    ON a.fp = b.fp AND a.doc_id < b.doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS i
      |  FROM cands c
      |  JOIN fpsets fa ON fa.doc_id = c.doc_a
      |  JOIN fpsets fb ON fb.doc_id = c.doc_b AND fb.fp = fa.fp
      |  GROUP BY c.doc_a, c.doc_b)
      |SELECT CAST(i.doc_a AS BIGINT) AS doc_a,
      |       CAST(i.doc_b AS BIGINT) AS doc_b,
      |       round(CAST(i.i AS DOUBLE) / least(sa.n, sb.n), 4) AS containment
      |FROM inter i
      |JOIN sizes sa ON sa.doc_id = i.doc_a
      |JOIN sizes sb ON sb.doc_id = i.doc_b
      |WHERE CAST(i.i AS DOUBLE) / least(sa.n, sb.n) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin),
    "D5/D3 winnowing (rolling-hash) fingerprint near-dup pairs")

  /** D5 — corpus length profile: EXACT token-count percentiles per
    * lang (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear
    * interpolation). Exact percentile aggregates a value→count map per
    * group, which is bounded here because token counts are small
    * integers; for unbounded domains at 100 TB swap in
    * `approx_percentile` (t-digest sketch, mergeable, same call
    * shape). */
  val t08TokenPercentiles: GraftQuery = q(
    "t08_token_percentiles",
    "D5 exact token-count percentiles per lang",
    """WITH d AS (
      |  SELECT lang, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      |  FROM documents)
      |SELECT lang,
      |       count(*)                             AS docs,
      |       round(quantile_cont(n_tok, 0.5), 2)  AS p50_tokens,
      |       round(quantile_cont(n_tok, 0.9), 2)  AS p90_tokens,
      |       min(n_tok)                           AS min_tokens,
      |       max(n_tok)                           AS max_tokens
      |FROM d
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"lang", size(tokens($"text")).as("n_tok"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("docs"),
        round(expr("percentile(n_tok, 0.5)"), 2).as("p50_tokens"),
        round(expr("percentile(n_tok, 0.9)"), 2).as("p90_tokens"),
        min($"n_tok").as("min_tokens"),
        max($"n_tok").as("max_tokens"))
      .orderBy($"lang")
  }

  /** D5 — vocabulary building: corpus-wide token frequencies, top 25
    * by (count desc, token asc). The canonical wordcount shape a
    * tokenizer-training pass runs at 100 TB: explode is a narrow
    * per-row flatMap, the groupBy gets map-side partial aggregation
    * (high-cardinality token keys — no skew funnel), and only the
    * bounded top-k crosses the final single-partition boundary via
    * Catalyst's rank-limit pushdown (TakeOrderedAndProject). */
  val t09VocabTopK: GraftQuery = q(
    "t09_vocab_topk",
    "D5 vocabulary build: corpus token frequencies, bounded top-k",
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |  FROM documents),
      |f AS (
      |  SELECT token, count(*) AS freq FROM tok GROUP BY token)
      |SELECT token, freq,
      |       row_number() OVER (ORDER BY freq DESC, token) AS rnk
      |FROM f
      |ORDER BY rnk
      |LIMIT 25""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    Tables(s, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(25)
      .withColumn("rnk", row_number().over(
        Window.orderBy($"freq".desc, $"token")))
  }

  /** D5 — TF-IDF lexical ranking for a fixed query term set (the
    * retrieval scoring primitive next to v06's vector search): per-doc
    * term frequencies are narrow projections, document frequencies are
    * ONE tiny global aggregate broadcast back to every row, and only
    * the bounded top-k crosses a partition boundary. Scoring is an
    * explicit left-associated sum of tf·idf products with smoothed
    * idf = ln((N+1)/(df+1)), so the double math is identical in both
    * engines. */
  val t10TfIdf: GraftQuery = q(
    "t10_tfidf_rank",
    "D5 TF-IDF ranking: per-doc tf, broadcast global df, bounded top-k",
    """WITH tf AS (
      |  SELECT doc_id,
      |         len(string_split(text, 'data'))  - 1 AS tf_data,
      |         len(string_split(text, 'query')) - 1 AS tf_query,
      |         len(string_split(text, 'model')) - 1 AS tf_model
      |  FROM documents),
      |df AS (
      |  SELECT count(*) AS n,
      |         count(*) FILTER (WHERE tf_data  > 0) AS df_data,
      |         count(*) FILTER (WHERE tf_query > 0) AS df_query,
      |         count(*) FILTER (WHERE tf_model > 0) AS df_model
      |  FROM tf),
      |scored AS (
      |  SELECT tf.doc_id,
      |         round(tf_data  * ln((n + 1.0) / (df_data  + 1.0))
      |             + tf_query * ln((n + 1.0) / (df_query + 1.0))
      |             + tf_model * ln((n + 1.0) / (df_model + 1.0)), 6) AS score
      |  FROM tf CROSS JOIN df)
      |SELECT doc_id, score,
      |       row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      |FROM scored
      |ORDER BY rnk
      |LIMIT 10""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    def occ(term: String): Column =
      size(split($"text", java.util.regex.Pattern.quote(term), -1)) - 1
    val tf = Tables(s, dir, "documents")
      .select($"doc_id",
        occ("data").as("tf_data"),
        occ("query").as("tf_query"),
        occ("model").as("tf_model"))
    val df = tf.agg(
      count(lit(1)).as("n"),
      count(when($"tf_data" > 0, 1)).as("df_data"),
      count(when($"tf_query" > 0, 1)).as("df_query"),
      count(when($"tf_model" > 0, 1)).as("df_model"))
    def idf(dfCol: Column, n: Column): Column = log((n + 1.0) / (dfCol + 1.0))
    tf.crossJoin(broadcast(df))
      .select($"doc_id",
        round($"tf_data" * idf($"df_data", $"n")
          + $"tf_query" * idf($"df_query", $"n")
          + $"tf_model" * idf($"df_model", $"n"), 6).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy($"score".desc, $"doc_id")))
      .select($"doc_id", $"score", $"rnk")
  }

  /** D5/D3 — eval-set CONTAMINATION screening: the decontamination
    * pass every LLM pipeline runs before training (GPT-3 appendix C
    * style): report train docs sharing any verbatim 13-token n-gram
    * with the held-out eval split, with the count of distinct shared
    * grams as evidence. Exact-span screening is deliberately distinct
    * from fuzzy dedup (d01/d05) — a train doc quoting 13 consecutive
    * eval tokens is contamination even at low whole-doc similarity.
    *
    * Scale shape: a PRODUCTION eval set is a fixed-size benchmark
    * suite (MMLU and friends — a few thousand docs regardless of
    * corpus size), so the eval gram set BROADCASTS and the corpus-side
    * grams are generated in a narrow typed flatMap and filtered
    * MAP-SIDE — no shuffle ever carries a train gram; the only
    * exchange is the final groupBy over matched (train, eval) pairs.
    * Caveat the synthetic fixture hides: this query's doc_id % 5 eval
    * split grows O(corpus) — fine at gate SFs, but with a genuinely
    * corpus-sized eval side the forced hint must go (the planner then
    * degrades to a shuffle join instead of an over-limit broadcast).
    * Gram generation is JIT'd Scala (HOF transform would evaluate
    * interpreted — HashSketch rationale). */
  val t11Contamination: GraftQuery = q(
    "t11_contamination",
    "D5/D3 eval-contamination screening: verbatim 13-gram overlap, broadcast eval side",
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         unnest(list_transform(generate_series(1, greatest(0, len(toks)-12)),
      |                i -> array_to_string(toks[i:i+12], ' '))) AS gram
      |  FROM d),
      |e AS (SELECT DISTINCT doc_id AS eval_id, gram FROM g WHERE doc_id % 5 = 0),
      |t AS (SELECT DISTINCT doc_id AS train_id, gram FROM g WHERE doc_id % 5 <> 0)
      |SELECT CAST(train_id AS BIGINT) AS train_id,
      |       CAST(eval_id AS BIGINT) AS eval_id,
      |       count(*) AS shared_grams
      |FROM t JOIN e USING (gram)
      |GROUP BY train_id, eval_id
      |ORDER BY train_id, eval_id""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    // per-doc gram dedup happens INSIDE the flatMap (bounded by doc
    // length), so neither side needs a distinct() — a corpus-wide
    // distinct would shuffle every train gram, which is exactly what
    // this operator's shape avoids. The split filter is applied BEFORE
    // the flatMap: a filter after a DeserializeToObject barrier can't
    // reach the scan, so filtering `grams` post-hoc would tokenize and
    // 13-gram the FULL corpus once per join side — here each side's
    // scan prunes to its own split and tokenizes it exactly once.
    def grams(side: DataFrame, idName: String): DataFrame =
      graft.functions.Par.widen(side
        .select($"doc_id", $"text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+")
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + 13 <= toks.length) {
          seen.add(toks.slice(i, i + 13).mkString(" "))
          i += 1
        }
        import scala.jdk.CollectionConverters._
        seen.iterator().asScala.map(g => (id, g))
      }
      .toDF(idName, "gram")
    val docs = Tables(s, dir, "documents")
    val evalGrams = grams(docs.where($"doc_id" % 5 === 0), "eval_id")
    val trainGrams = grams(docs.where($"doc_id" % 5 =!= 0), "train_id")
    trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy($"train_id", $"eval_id")
      .agg(count(lit(1)).as("shared_grams"))
      .orderBy($"train_id", $"eval_id")
  }

  /** D5 — CONTEXT-WINDOW CHUNKING with stride: split every document
    * into fixed-size token windows (32 tokens, stride 24 ⇒ 8-token
    * overlap) — the preprocessing step that turns documents into
    * training sequences / retrieval passages. Chunk identity is the
    * md5 of the space-joined window, so the output is engine-
    * comparable without shipping chunk text.
    *
    * Scale shape: a narrow typed flatMap (JIT'd — array slicing in a
    * Catalyst HOF would run interpreted), fan-out ≈ len/stride per
    * doc, map-side only; nothing shuffles but the ordered output
    * itself. Start positions cover every token (last window may be
    * short), and the start grid is deterministic, so both engines
    * enumerate identical chunks. */
  val t12DocChunks: GraftQuery = q(
    "t12_doc_chunks",
    "D5 context-window chunking (32-token windows, stride 24, md5 chunk ids)",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |i AS (
      |  SELECT doc_id, toks,
      |         unnest(generate_series(0,
      |           CAST(floor(greatest(len(toks) - 1, 0) / 24) AS BIGINT))) AS ci
      |  FROM t),
      |c AS (
      |  SELECT doc_id, ci, toks[ci*24 + 1 : least(ci*24 + 32, len(toks))] AS ch
      |  FROM i)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(ci AS BIGINT) AS chunk_idx,
      |       CAST(len(ch) AS BIGINT) AS n_toks,
      |       md5(array_to_string(ch, ' ')) AS chunk_md5
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val W = 32; val S = 24
    graft.functions.Par.widen(Tables(s, dir, "documents")
        .select($"doc_id", $"text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.trim.split("\\s+")
        val md = java.security.MessageDigest.getInstance("MD5")
        val maxI = math.max(0, (toks.length - 1) / S)
        (0 to maxI).iterator.map { i =>
          val ch = toks.slice(i * S, math.min(i * S + W, toks.length))
          val hex = md.digest(ch.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, i.toLong, ch.length.toLong, hex)
        }
      }
      .toDF("doc_id", "chunk_idx", "n_toks", "chunk_md5")
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** t13 — PII screening + redaction ([[graft.functions.PiiOps]]):
    * emails / SSNs / phone numbers / IPv4s detected and scrubbed, the
    * release gate of every training-data pipeline. The corpus text is
    * digit-free, so to make the oracle exercise real matches both
    * engines append the SAME deterministic doc_id-derived PII suffix
    * to a sliver of docs (doc_id mod 7 selects the kind) before
    * screening — synthetic hits, built only from testdata values,
    * identically in SQL. Counts run on unredacted text; redaction is
    * the fixed-order regexp_replace chain; output is the per-source
    * screening report. Plan: one narrow map over the corpus + the
    * tiny per-source aggregate — no shuffle carries text. The spec
    * additionally pins detection/redaction semantics on PII fixtures.
    */
  val t13PiiScrub: GraftQuery = q(
    "t13_pii_scrub",
    "D5 PII screening + redaction (emails/SSNs/phones/IPv4)", {
      import graft.functions.PiiOps._
      s"""WITH aug AS (
        |  SELECT source,
        |         text || CASE CAST(doc_id % 7 AS INT)
        |           WHEN 0 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |           WHEN 1 THEN ' ssn 123-45-6789'
        |           WHEN 2 THEN ' call 555-867-5309'
        |           WHEN 3 THEN ' ip 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)
        |           ELSE '' END AS t
        |  FROM documents),
        |f AS (
        |  SELECT source,
        |         ${piiCountSql("t", EmailRe)} AS emails,
        |         ${piiCountSql("t", SsnRe)} AS ssns,
        |         ${piiCountSql("t", PhoneRe)} AS phones,
        |         ${piiCountSql("t", Ipv4Re)} AS ips,
        |         length(t) - length(${redactSql("t")}) AS dchars
        |  FROM aug)
        |SELECT source, count(*) AS docs,
        |       count(*) FILTER (emails + ssns + phones + ips > 0) AS pii_docs,
        |       CAST(sum(emails) AS BIGINT) AS emails,
        |       CAST(sum(ssns) AS BIGINT) AS ssns,
        |       CAST(sum(phones) AS BIGINT) AS phones,
        |       CAST(sum(ips) AS BIGINT) AS ips,
        |       CAST(sum(dchars) AS BIGINT) AS chars_redacted
        |FROM f GROUP BY source ORDER BY source""".stripMargin
    }
  ) { (s, dir) =>
    import s.implicits._
    import graft.functions.PiiOps
    val m7 = $"doc_id" % 7
    // Par.widen: four regex counters + the redact chain are the whole
    // cost and fuse into the 1-split scan (guide §2)
    val aug = graft.functions.Par.widen(Tables(s, dir, "documents")
      .select($"source",
        concat($"text",
          when(m7 === 0, concat(lit(" mail user"),
            $"doc_id".cast("string"), lit("@example.com")))
            .when(m7 === 1, lit(" ssn 123-45-6789"))
            .when(m7 === 2, lit(" call 555-867-5309"))
            .when(m7 === 3, concat(lit(" ip 10.0.0."),
              ($"doc_id" % 255).cast("string")))
            .otherwise(lit(""))).as("t")))
    val f = aug.select($"source",
      PiiOps.piiCount($"t", PiiOps.EmailRe).as("emails"),
      PiiOps.piiCount($"t", PiiOps.SsnRe).as("ssns"),
      PiiOps.piiCount($"t", PiiOps.PhoneRe).as("phones"),
      PiiOps.piiCount($"t", PiiOps.Ipv4Re).as("ips"),
      (length($"t") - length(PiiOps.redact($"t"))).as("dchars"))
    f.groupBy($"source")
      .agg(
        count(lit(1)).as("docs"),
        count(when($"emails" + $"ssns" + $"phones" + $"ips" > 0, 1))
          .as("pii_docs"),
        sum($"emails").cast("long").as("emails"),
        sum($"ssns").cast("long").as("ssns"),
        sum($"phones").cast("long").as("phones"),
        sum($"ips").cast("long").as("ips"),
        sum($"dchars").cast("long").as("chars_redacted"))
      .orderBy($"source")
  }

  /** t14 — bigram language-model perplexity scoring (the CCNet-style
    * quality filter: score each document by an n-gram LM trained on
    * the corpus itself, filter the high-perplexity tail). Add-one
    * smoothed conditional probs P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V);
    * per-doc score = mean −ln P over its bigrams, rounded 6 (absorbs
    * summation order and the ≤1-ulp libm ln() divergence), then the
    * per-lang report with a filtered-count at nll > 3.45.
    *
    * Plan: bigram expansion is a map-side slice+zip (no shuffle);
    * counting tables are two hash aggs; scoring joins the doc bigrams
    * to c2/c1 — all linear shuffles on n-gram keys. Stopword keys skew
    * c1; at 100 TB the c1 join is the AQE-skew/salting candidate, or
    * broadcast when the vocab fits (it usually does — even web-scale
    * vocabs are ~10⁷ rows). V (vocab size) rides along as a broadcast
    * one-row aggregate (the oracle's vv CTE) — exact, deterministic,
    * and part of the same lazy plan. */
  val t14BigramLm: GraftQuery = q(
    "t14_bigram_lm",
    "D5 bigram LM perplexity scoring + high-ppl filter per lang",
    raw"""WITH tk AS (
      |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
      |  FROM tk WHERE len(toks) >= 2),
      |bg AS (SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM (SELECT unnest(toks) AS w1 FROM tk) GROUP BY w1),
      |vv AS (SELECT count(*) AS v FROM c1),
      |sc AS (
      |  SELECT bg.doc_id, bg.lang,
      |         round(avg(-ln((c2.c2 + 1.0) / (c1.c1 + vv.v))), 6) AS nll
      |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv
      |  GROUP BY bg.doc_id, bg.lang)
      |SELECT lang, count(*) AS docs, round(avg(nll), 4) AS mean_nll,
      |       count(*) FILTER (nll > 3.45) AS filtered
      |FROM sc GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    // (r16: Par.widen was measured here and REJECTED both ways —
    // 0.80 s → 1.46 min-of-4 widening the tokens() projection (boxed
    // arrays through the exchange) and → 1.42 widening the raw text:
    // t14's cost is the bigram counting joins, not the scan, and the
    // extra exchange only feeds them later)
    val tk = Tables(s, dir, "documents")
      .select($"doc_id", $"lang", tokens($"text").as("toks"))
    val n = size($"toks")
    val bg = tk.where(n >= 2)
      .select($"doc_id", $"lang",
        explode(arrays_zip(
          slice($"toks", lit(1), n - 1),
          slice($"toks", lit(2), n - 1))).as("p"))
      .select($"doc_id", $"lang",
        $"p".getField("0").as("w1"), $"p".getField("1").as("w2"))
    val c2 = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val c1 = tk.select(explode($"toks").as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("c1"))
    // vocab size as a broadcast 1-row frame (the oracle's vv CTE) —
    // keeps the whole query one lazy plan, no eager driver count job
    val vv = c1.agg(count(lit(1)).cast("double").as("v"))
    val sc = bg
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vv))
      .groupBy($"doc_id", $"lang")
      .agg(round(avg(-log(($"c2" + 1.0) / ($"c1" + $"v"))), 6)
        .as("nll"))
    sc.groupBy($"lang")
      .agg(count(lit(1)).as("docs"),
        round(avg($"nll"), 4).as("mean_nll"),
        count(when($"nll" > 3.45, 1)).as("filtered"))
      .orderBy($"lang")
  }

  /** t15 — within-document repetition filter (the Gopher-rule family,
    * Rae et al. '21): fraction of duplicate 3-grams inside each doc —
    * high values mean boilerplate/self-repetition, a standard
    * pre-training exclusion signal. dup_frac = 1 − distinct/total
    * trigrams (two int counts + one division — engine-exact), flagged
    * at > 0.01 (the corpus's p95). Everything is per-document map-side
    * work (slice+zip trigram expansion, a per-doc count-distinct agg)
    * followed by the tiny per-source report — no cross-doc join at
    * all, so the operator is embarrassingly linear at any scale. */
  val t15RepetitionFilter: GraftQuery = q(
    "t15_repetition_filter",
    "D5 within-doc duplicate-trigram fraction + boilerplate flag",
    raw"""WITH tk AS (
      |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, source, toks, unnest(range(1, len(toks) - 1)) AS i
      |  FROM tk WHERE len(toks) >= 3),
      |g AS (
      |  SELECT doc_id, source,
      |         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
      |  FROM pos),
      |m AS (
      |  SELECT doc_id, source, count(*) AS total,
      |         count(DISTINCT gram) AS uniq
      |  FROM g GROUP BY doc_id, source),
      |f AS (
      |  SELECT source,
      |         round(1.0 - CAST(uniq AS DOUBLE) / total, 6) AS dupfrac
      |  FROM m)
      |SELECT source, count(*) AS docs,
      |       round(avg(dupfrac), 4) AS mean_dup_frac,
      |       count(*) FILTER (dupfrac > 0.01) AS flagged
      |FROM f GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    // Par.widen BEFORE tokenizing (the t14 lesson: shuffle the raw
    // text, never the boxed token array): trigram expansion + the
    // per-doc distinct are map-side CPU on the 1-split scan (guide §2)
    val tk = graft.functions.Par.widen(Tables(s, dir, "documents")
        .select($"doc_id", $"source", $"text"))
      .select($"doc_id", $"source", tokens($"text").as("toks"))
    val n = size($"toks")
    val g = tk.where(n >= 3)
      .select($"doc_id", $"source",
        explode(arrays_zip(
          slice($"toks", lit(1), n - 2),
          slice($"toks", lit(2), n - 2),
          slice($"toks", lit(3), n - 2))).as("p"))
      .select($"doc_id", $"source",
        concat_ws(" ", $"p".getField("0"), $"p".getField("1"),
          $"p".getField("2")).as("gram"))
    val m = g.groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("total"), countDistinct($"gram").as("uniq"))
    val f = m.select($"source",
      round(lit(1.0) - $"uniq".cast("double") / $"total", 6).as("dupfrac"))
    f.groupBy($"source")
      .agg(count(lit(1)).as("docs"),
        round(avg($"dupfrac"), 4).as("mean_dup_frac"),
        count(when($"dupfrac" > 0.01, 1)).as("flagged"))
      .orderBy($"source")
  }

  /** t16 — Zipf power-law fit: least-squares slope of
    * ln(freq) ~ ln(rank) over each language's top-100 vocabulary.
    * Natural corpora sit near slope −1; a corpus whose slope drifts
    * far off is synthetic, templated, or contaminated — a standard
    * corpus-statistics sanity gate. Closed-form regression from six
    * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) — one bounded
    * top-k ranking (WindowGroupLimit) + a 5-row aggregate; slope and
    * R² rounded to 4 (the ≤1-ulp libm ln() and 100-term sum-order
    * effects sit ~1e-13, far below). Ranking ties break by token so
    * both engines rank — and therefore ln(rank) — identically. */
  val t16ZipfFit: GraftQuery = q(
    "t16_zipf_fit",
    "D5 Zipf slope + R² per lang over the top-100 vocabulary",
    raw"""WITH tok AS (
      |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents),
      |f AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY lang, w),
      |r AS (
      |  SELECT lang, c,
      |         row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rnk
      |  FROM f),
      |t AS (SELECT lang, ln(rnk) AS x, ln(c) AS y FROM r WHERE rnk <= 100),
      |s AS (
      |  SELECT lang, count(*) AS n, avg(x) AS mx, avg(y) AS my,
      |         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM t GROUP BY lang)
      |SELECT lang, n,
      |       round((sxy - n * mx * my) / nullif(sxx - n * mx * mx, 0), 4) AS zipf_slope,
      |       round(pow(sxy - n * mx * my, 2)
      |             / nullif((sxx - n * mx * mx) * (syy - n * my * my), 0), 4) AS r2
      |FROM s ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val tok = Tables(s, dir, "documents")
      .select($"lang", explode(tokens($"text")).as("w"))
    val f = tok.groupBy($"lang", $"w").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"c".desc, $"w")
    val t = f.withColumn("rnk", row_number().over(w))
      .where($"rnk" <= 100)
      .select($"lang", log($"rnk").as("x"), log($"c").as("y"))
    t.groupBy($"lang")
      .agg(count(lit(1)).as("n"), avg($"x").as("mx"), avg($"y").as("my"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"))
      .select($"lang", $"n",
        // 0/0 guards: a degenerate vocabulary (all counts equal, or a
        // single distinct token) zeroes a denominator — NULL in both
        // engines, never a Spark NaN vs DuckDB divergence
        round(($"sxy" - $"n" * $"mx" * $"my")
          / nullif($"sxx" - $"n" * $"mx" * $"mx", lit(0)), 4).as("zipf_slope"),
        round(pow($"sxy" - $"n" * $"mx" * $"my", 2)
          / nullif(($"sxx" - $"n" * $"mx" * $"mx")
            * ($"syy" - $"n" * $"my" * $"my"), lit(0)), 4).as("r2"))
      .orderBy($"lang")
  }

  /** t17 — corpus-level boilerplate segment removal (C4/RefinedWeb
    * line-dedup, adapted to the flat token streams of `documents`:
    * the "line" is a fixed non-overlapping 3-token segment). Exact
    * SUB-document dedup — the family member t04 (whole-doc) and t12
    * (chunking, no dedup) don't cover: count each segment's distinct
    * docs corpus-wide, mark segments seen in ≥ 2 docs as boilerplate,
    * and emit per doc the kept/dropped mass plus an md5 of the
    * reassembled (position-ordered) cleaned text — reassembly is the
    * part that keeps this an edit, not just a filter report.
    *
    * Scale: explode to (doc_id, pos, segment) — tokens/3 rows, narrower
    * than the t07 winnowing explode — one hash agg on segment, one
    * shuffle join back, one per-doc agg whose collect buffer is bounded
    * by document length — the testdata corpus tops out at 100 tokens
    * (≤ 34 segments/doc); a corpus with pathological multi-MB docs
    * should bound the buffer explicitly by chunking first (t12's
    * operator is exactly that pre-pass). The segment-frequency table
    * is the reusable artifact: a
    * real pipeline computes it once per crawl and anti-joins every
    * shard against it. */
  val t17BoilerplateRemoval: GraftQuery = q(
    "t17_boilerplate_removal",
    "corpus-wide exact segment dedup: flag+strip 3-token segments seen in >=2 docs",
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id, toks,
      |         unnest(generate_series(0, (len(toks) + 2) // 3 - 1)) AS pos
      |  FROM t),
      |segs AS (
      |  SELECT doc_id, pos,
      |         array_to_string(toks[(pos*3+1):(pos*3+3)], ' ') AS seg
      |  FROM ex),
      |counts AS (
      |  SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY seg),
      |f AS (SELECT s.doc_id, s.pos, s.seg, c.n_docs
      |      FROM segs s JOIN counts c USING (seg))
      |SELECT doc_id,
      |       count(*) AS n_segments,
      |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS boiler_segments,
      |       md5(coalesce(string_agg(CASE WHEN n_docs < 2 THEN seg END,
      |                               ' ' ORDER BY pos), '')) AS kept_md5
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val toks = tokens($"text")
    val segs = Tables(s, dir, "documents")
      .select($"doc_id",
        posexplode(transform(
          // ceil(n/3) segments: (n+2) div 3 — int division on both
          // engines (Column `/` is double division, hence the expr)
          sequence(lit(0), expr("(size(split(trim(text), '\\\\s+')) + 2) div 3 - 1")),
          i => array_join(slice(toks, i * 3 + 1, lit(3)), " "))).as(Seq("pos", "seg")))
    // "seen in ≥ 2 docs" needs no distinct-count: doc_id is non-null,
    // so countDistinct(doc_id) ≥ 2 ⟺ min(doc_id) ≠ max(doc_id). The
    // min/max window over seg computes the flag in the ONE exchange
    // the segment mass must cross anyway — the previous
    // countDistinct-aggregate + join-back shape shuffled that mass
    // three times (agg build, join probe, sort-merge) for the same
    // boolean.
    val wSeg = Window.partitionBy($"seg")
    segs
      .withColumn("boiler",
        min($"doc_id").over(wSeg) =!= max($"doc_id").over(wSeg))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when($"boiler", 1).otherwise(0)).as("boiler_segments"),
        md5(array_join(transform(
          array_sort(collect_list(when(!$"boiler", struct($"pos", $"seg")))),
          _.getField("seg")), " ")).as("kept_md5"))
      .orderBy($"doc_id")
  }

  /** The t18 query-term set — a constant of the operator (a real
    * system takes them per request; the gate needs one deterministic
    * instance). */
  private[queries] val Bm25Terms = Seq("data", "query", "model", "vector")

  /** The index-served BM25 scoring stage shared by t18 (standalone
    * ranking) and c12 (the lexical leg of indexed hybrid retrieval):
    * pruned posting read → broadcast df + stats → one per-doc hash
    * agg. Returns (doc_id, score, terms_hit); see [[t18Bm25Search]]
    * for the full plan rationale. */
  private[graft] def bm25Scores(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val (postAll, stats) = graft.operators.IndexStore.bm25Postings(s, dir)
    // the pruned posting read: IN-list pushes to the parquet scan, and
    // the term-range-sorted layout turns it into file/row-group skips
    val post = postAll.where($"term".isin(Bm25Terms: _*))
    val df = post.groupBy($"term").agg(count(lit(1)).as("df"))
    post
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .groupBy($"doc_id")
      .agg(
        round(sum(
          log(lit(1.0) + ($"n" - $"df" + 0.5) / ($"df" + 0.5))
            * ($"tf" * 2.2)
            / ($"tf" + lit(1.2) * (lit(0.25) + (lit(0.75) * ($"dl" * $"n"))
                                            / $"sdl".cast("double")))), 6)
          .as("score"),
        count(lit(1)).as("terms_hit"))
  }

  /** DuckDB rendering of [[bm25Scores]] — CTEs `tk..sc` replaying
    * tokenize → postings → df → BM25 (the oracle always recomputes
    * from `documents`; the index is the ENGINE's shortcut, not the
    * truth's). Shared by t18's oracle and c12's. */
  private[queries] def bm25Ctes: String =
    raw"""tk AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
      |st AS (SELECT count(*) AS n, sum(dl) AS sdl FROM dl),
      |post AS (
      |  SELECT doc_id, term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(toks) AS term FROM tk)
      |  WHERE term IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
      |  GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      |sc AS (
      |  SELECT p.doc_id,
      |         round(sum(
      |           ln(1.0 + (st.n - d.df + 0.5) / (d.df + 0.5))
      |             * (p.tf * 2.2)
      |             / (p.tf + 1.2 * (0.25 + (0.75 * (l.dl * st.n))
      |                                      / CAST(st.sdl AS DOUBLE)))), 6)
      |           AS score,
      |         count(*) AS terms_hit
      |  FROM post p
      |  JOIN df d USING (term)
      |  JOIN dl l USING (doc_id)
      |  CROSS JOIN st
      |  GROUP BY p.doc_id)""".stripMargin

  /** t18 — BM25 ranked retrieval SERVED FROM the persisted inverted
    * index ([[graft.operators.IndexStore.bm25Postings]]) — the lexical
    * half of a production retrieval stack (the c03 RRF fusion's
    * missing leg: c03 ranks by 3-term TF-IDF recomputed from raw text
    * every run; this is index-backed Robertson/Spärck-Jones BM25,
    * k1 = 1.2, b = 0.75). The warm path never touches `documents`:
    * it reads the term-range-sorted posting table with a
    * `term IN (…)` predicate (file- and row-group-pruned — the plan
    * pin asserts pushdown and zero documents-table scans), broadcasts
    * the per-term df counts and the one-row corpus stats, scores each
    * posting map-side, and one hash-agg per doc_id sums the ≤|terms|
    * partial scores — shuffle mass = matched postings, not corpus
    * rows. idf = ln(1 + (N − df + ½)/(df + ½)) ≥ 0 (the +1 form, so
    * common terms can't go negative); length norm uses
    * dl·N/Σdl ≡ dl/avgdl with integer numerators for cross-engine
    * exactness; the final per-doc sum is ≤ 4 addends under round-6,
    * the c03 contract. */
  val t18Bm25Search: GraftQuery = q(
    "t18_bm25_index_search",
    "D5/D6 BM25 top-k retrieval from the persisted term-sorted inverted index",
    s"""WITH $bm25Ctes
      |SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
      |       CAST(doc_id AS BIGINT) AS doc_id, score,
      |       CAST(terms_hit AS BIGINT) AS terms_hit
      |FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val sc = bm25Scores(s, dir)
    val w = Window.orderBy($"score".desc, $"doc_id")
    sc.orderBy($"score".desc, $"doc_id").limit(10)
      .withColumn("rnk", row_number().over(w))
      .select($"rnk", $"doc_id", $"score", $"terms_hit")
      .orderBy($"rnk")
  }

  /** t19 — HASHED-FEATURE LINEAR CLASSIFIER INFERENCE: the
    * model-based quality filter every LLM data pipeline runs (CCNet's
    * fastText language/quality classifiers, DSIR's importance models —
    * public designs) re-expressed as pure relational inference: bag of
    * hashed token features (the hashing trick, dim 4096) joined
    * against a BROADCAST weight table, logits summed per doc — one
    * explode + one broadcast join + one hash aggregate; no UDF, no
    * array columns in any shuffle, text never leaves the map side.
    * The weight table here is a deterministic fixture (w(idx) =
    * (idx·2654435761) mod 2001 − 1000 — a stand-in the scaladoc
    * declares; a real deployment loads trained weights into the same
    * broadcast join), and the logit is an INTEGER sum so both engines
    * replay it exactly — the oracle recomputes features, weights, and
    * per-doc logits from raw text. At 100 TB: weights are kilobytes
    * broadcast everywhere, inference cost is one corpus scan. */
  val t19QualityClassifier: GraftQuery = q(
    "t19_quality_classifier",
    "D5 hashed-feature linear classifier inference: broadcast weights, integer logits",
    s"""WITH toks AS (
      |  SELECT doc_id, lang,
      |         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang,
      |         ${graft.functions.DetHash.hash60Sql("tok", "qlr")} % 4096 AS idx
      |  FROM toks),
      |sc AS (
      |  SELECT doc_id, lang,
      |         CAST(sum((idx * 2654435761) % 2001 - 1000) AS BIGINT) AS logit_fp
      |  FROM f GROUP BY 1, 2)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN logit_fp > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_pass,
      |       CAST(sum(logit_fp) AS BIGINT) AS logit_mass,
      |       CAST(max(logit_fp) AS BIGINT) AS max_logit
      |FROM sc GROUP BY 1 ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    // the "model": 4096 weights as a broadcast dim — the serving
    // shape; swap the range-generated fixture for loaded weights and
    // nothing else changes
    val weights = s.range(4096).select($"id".as("idx"),
      (($"id" * 2654435761L) % 2001L - 1000L).as("w"))
    // Par.widen: the per-token md5 feature hash is the whole inference
    // cost and fuses into the 1-split scan (guide §2)
    val feats = graft.functions.Par.widen(Tables(s, dir, "documents")
        .select($"doc_id", $"lang", $"text"))
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .select($"doc_id", $"lang",
        pmod(graft.functions.DetHash.hash60($"tok", "qlr"), lit(4096L))
          .as("idx"))
    val logits = feats.join(broadcast(weights), Seq("idx"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"w").as("logit_fp"))
    logits.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"logit_fp" > 0, 1L).otherwise(0L)).as("n_pass"),
        sum($"logit_fp").as("logit_mass"),
        max($"logit_fp").as("max_logit"))
      .orderBy($"lang")
  }

  val all: Seq[GraftQuery] = Seq(
    t01TokenStats, t02QualityScore, t03LangId, t04Fingerprint,
    t05JaccardPairs, t06BpeTokens, t07Winnowing, t08TokenPercentiles,
    t09VocabTopK, t10TfIdf, t11Contamination, t12DocChunks, t13PiiScrub,
    t14BigramLm, t15RepetitionFilter, t16ZipfFit, t17BoilerplateRemoval,
    t18Bm25Search, t19QualityClassifier)
}
