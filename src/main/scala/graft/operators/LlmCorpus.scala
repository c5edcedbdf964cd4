package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level curation/export operators that round out the
  * training-data pipeline: deterministic shuffle-shard assignment for
  * training export, unigram language-model quality scoring (the
  * perplexity-filter shape of CCNet-style curation), and cross-document
  * duplicated-substring detection (the exact-substring-dedup shape of
  * "Deduplicating Training Data Makes Language Models Better", Lee et
  * al. 2022 — windowed rolling hashes instead of a suffix array, which
  * is the distributable reformulation).
  *
  * Same cross-engine determinism rules as [[LlmText]]/[[LlmPrep]]:
  * hashes are md5 hex strings, orderings are explicit over those
  * strings, floating aggregates are rounded to 6 places on both sides.
  *
  * Keep in sync with [[LlmCorpusSql]].
  */
object LlmCorpus {

  /** Whitespace tokens of lower(text), empties dropped — the shared
    * [[graft.functions.TokenSplit]] kernel. */
  private def toks(c: Column): Column =
    call_function("graft_tokens", c)

  /** Shard count for [[shuffleShards]] — stands in for the thousands of
    * output shards a real export writes; the assignment math is
    * shard-count-agnostic. */
  val ExportShards = 8

  /** Deterministic global shuffle + shard assignment for training
    * export: every document gets a pseudo-random `shard` (uniform over
    * [0, nShards)) and a within-shard `seq` position in hash order.
    * Writing `partitionBy(shard)` ordered by `seq` then yields the
    * shuffled, sharded corpus a trainer streams — without any global
    * sort or RNG state.
    *
    * Scale shape: the hash is a per-row projection; the only shuffle is
    * the `partitionBy(shard)` window (exactly the exchange the shard
    * write needs anyway, so at cluster scale the window and the write
    * share one exchange). No global ordering is ever materialized —
    * within-shard order is enough for training-data shuffling, which is
    * the standard trick that keeps corpus export embarrassingly
    * parallel at 100 TB.
    *
    * Determinism across engines: `shard` parses the first 4 hex chars
    * of md5("shard:" || doc_id) as an integer (Spark `conv`, DuckDB
    * `'0x…'` cast) mod nShards; `seq` ranks by the remaining hash
    * suffix with doc_id as the unique tiebreak. */
  def shuffleShards(documents: DataFrame,
      nShards: Int = ExportShards): DataFrame = {
    val h = md5(concat(lit("shard:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("hsuf"), col("doc_id"))
    documents
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        (conv(substring(h, 1, 4), 16, 10).cast("long") % nShards)
          .as("shard"),
        substring(h, 5, 28).as("hsuf"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("seq"), col("n_tokens"))
  }

  /** Unigram language-model quality score per document — the
    * distributable stand-in for the KenLM perplexity filter of
    * CCNet-style curation: a unigram LM is fit on the corpus itself
    * (add-one smoothing over the observed vocabulary) and every
    * document is scored by its mean token log-probability and the
    * corresponding perplexity. Documents whose perplexity is far above
    * the corpus norm are gibberish/boilerplate candidates; far below,
    * degenerate repetition.
    *
    * Scale shape: token counts are one shuffle keyed by term
    * (vocab-sized result); the corpus totals are a single broadcast
    * row; scoring joins the corpus token stream to the count table on
    * term (linear equi-join — the count side has one row per term, so
    * hot terms fan out but never explode), then aggregates per doc.
    * No driver-side model object: the "model" is a DataFrame. */
  def unigramLm(documents: DataFrame): DataFrame = {
    val cnt = unigramCounts(documents)
    unigramScore(documents, cnt,
      cnt.agg(sum(col("c")).as("n_total"), count(lit(1)).as("v_size")))
  }

  /** The trained unigram LM: (tok, c) corpus term counts — one shuffle
    * keyed by term. The "model" both [[unigramLm]] and the streaming
    * quality screen score against. */
  def unigramCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** Score `documents` against a trained LM (`cnt` = (tok, c), `stats`
    * = one (n_total, v_size) row): add-one smoothing, so a token
    * UNSEEN in training scores ln(1) - ln(N + V) — the left join +
    * coalesce(0) is what makes out-of-vocabulary scoring well-defined
    * when the scored stream is not the training corpus. */
  def unigramScore(documents: DataFrame, cnt: DataFrame,
      stats: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .join(cnt, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(coalesce(col("c"), lit(0L)) + 1) -
          log(col("n_total") + col("v_size"))).as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(exp(-avg(col("logp"))), 6).as("ppl"))

  /** Duplicated-span gram length (tokens) for [[substrDup]]: any
    * verbatim shared token span of ≥ DupN tokens is caught regardless
    * of where it sits in either document — token shingles at stride 1
    * are alignment-free, unlike fixed-offset char windows (a copy at a
    * shifted offset would dodge every position-based window). */
  val DupN = 8

  /** Cross-document duplicated-substring detection — the per-document
    * "how much of this text is copied verbatim from elsewhere" signal
    * that exact-substring dedup trims on: each document's distinct
    * [[DupN]]-token spans are hashed; a span seen in ≥ 2 distinct
    * documents is duplicated. Output per document (≥ DupN tokens):
    * distinct-span count, duplicated-span count, duplicated fraction.
    * A high `dup_ratio` document is mostly copied text even when no
    * whole-document near-dup fires.
    *
    * Scale shape: shingling is a per-row kernel scan (no shuffle);
    * span document-frequency is one count window keyed by the span
    * (the same shuffle a groupBy would take — a boilerplate span shared
    * by a million documents contributes 1M count rows, never a 1M×1M
    * join); the verdict re-aggregates by doc_id. All linear in corpus
    * size, same candidate discipline as [[LlmPrep.contamination]]. */
  def substrDup(documents: DataFrame, n: Int = DupN): DataFrame = {
    val posting = documents
      .select(col("doc_id"),
        explode(call_function("graft_ngrams", col("text"), lit(n)))
          .as("gram"))
    val wdf = Window.partitionBy(col("gram"))
    posting
      .withColumn("df", count(lit(1)).over(wdf))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ratio", round(col("n_dup") / col("n_spans"), 6))
  }
}

/** DuckDB twin of [[LlmCorpus]] — same hash family, same window/stride
  * constants, same fold and rounding conventions. */
object LlmCorpusSql {

  import LlmCorpus._

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

  val shuffleShardsSql: String =
    s"""WITH h AS (SELECT doc_id,
      CAST(len($toksSql) AS BIGINT) AS n_tokens,
      md5('shard:' || CAST(doc_id AS VARCHAR)) AS hh
      FROM documents),
    s AS (SELECT doc_id, n_tokens,
      CAST('0x' || substr(hh, 1, 4) AS BIGINT) % $ExportShards AS shard,
      substr(hh, 5, 28) AS hsuf
      FROM h)
    SELECT doc_id, shard,
      CAST(row_number() OVER (PARTITION BY shard
        ORDER BY hsuf, doc_id) AS BIGINT) AS seq,
      n_tokens
    FROM s"""

  val unigramLmSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    stats AS (SELECT sum(c) AS n_total, count(*) AS v_size FROM cnt),
    scored AS (SELECT doc_id,
      ln(c + 1) - ln(n_total + v_size) AS logp
      FROM t JOIN cnt USING (tok) CROSS JOIN stats)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      round(avg(logp), 6) AS avg_logp,
      round(exp(-avg(logp)), 6) AS ppl
    FROM scored GROUP BY doc_id"""

  val substrDupSql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
    ng AS (SELECT doc_id,
      list_distinct([array_to_string(toks[i:i+${DupN - 1}], ' ')
        for i in range(1, len(toks) - ${DupN - 2})]) AS grams
      FROM tk WHERE len(toks) >= $DupN),
    posting AS (SELECT doc_id, g.gram
      FROM ng, UNNEST(grams) AS g(gram)),
    pdf AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df
      FROM posting)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
        AS dup_ratio
    FROM pdf GROUP BY doc_id"""
}
