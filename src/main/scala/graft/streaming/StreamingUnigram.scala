package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CacheScope, LlmCorpus}

/** Streaming unigram-LM quality scoring — the streaming twin of
  * [[graft.operators.LlmCorpus.unigramLm]], in the shape an ingest
  * pipeline actually runs the perplexity filter: the LM is trained
  * ONCE on a trusted reference corpus (a static, pinned count table),
  * and arriving documents are scored against it the moment they land.
  * Out-of-vocabulary tokens are exactly what the screen exists to
  * catch — add-one smoothing scores them ln(1) - ln(N + V), so a
  * gibberish document's perplexity spikes instead of its tokens being
  * silently dropped.
  *
  * Deliberately STATELESS (`foreachBatch` over the shared batch
  * kernel): a document's tokens all travel in its own row, so every
  * per-doc score is complete within the batch that carries the doc —
  * streaming aggregation state would add nothing but an unbounded
  * footprint. Scoring reuses [[LlmCorpus.unigramScore]] verbatim, so
  * the batch and streaming sides cannot drift.
  */
object StreamingUnigram {

  /** Train the static LM from the reference corpus: pinned (tok, c)
    * counts + the one-row (n_total, v_size) totals. Both sit on the
    * static side of every micro-batch's join for the lifetime of the
    * query. */
  def lmIndex(refDocs: DataFrame): (DataFrame, DataFrame) = {
    val cnt = CacheScope.pin(LlmCorpus.unigramCounts(refDocs))
    val stats = CacheScope.pin(cnt.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("v_size")))
    (cnt, stats)
  }

  /** Start the scoring query: each micro-batch of `docs` is scored
    * against the trained LM and handed to `emit` (append a score
    * table, route low-quality ids to quarantine — the caller's
    * policy). */
  def start(docs: DataFrame, cnt: DataFrame, stats: DataFrame,
      emit: DataFrame => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          emit(LlmCorpus.unigramScore(batch, cnt, stats))
      }
      .start()
  }
}
