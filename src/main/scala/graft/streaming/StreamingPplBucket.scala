package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CacheScope, LlmCorpus}

/** Streaming CCNet-style perplexity bucketing — the stream twin of
  * [[graft.operators.LlmCorpus.pplBucketByCutoff]], in the regime a
  * continuous curation pipeline actually runs it: the unigram LM is
  * trained ONCE on a trusted reference corpus and the per-language
  * head/middle/tail cutoffs are FROZEN from that same corpus; every
  * arriving document is scored and bucketed the moment it lands.
  * Frozen cutoffs are the point, not a compromise — a bucket decision
  * must not depend on what else happened to arrive that hour, and
  * cutoff drift is audited OFFLINE by re-running the batch operator
  * on a recent window and comparing [[LlmCorpus.pplCutoffs]] rows.
  *
  * Stateless like [[StreamingUnigram]] (a document's score and bucket
  * are complete within its own batch against the static LM + cutoff
  * tables), and built from the SAME kernels — `unigramScore` and
  * `bucketByCutoffs` — so the streamed bucket rule cannot drift from
  * the batch one (NULL-language documents included: they bucket as
  * their own group through the null-safe cutoff join).
  */
object StreamingPplBucket {

  /** Train the static side from the reference corpus: the pinned LM
    * (counts + totals) and the frozen per-language cutoffs. */
  def index(refDocs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val (cnt, stats) = StreamingUnigram.lmIndex(refDocs)
    val scoredRef = refDocs.select(col("doc_id"), col("lang"))
      .join(LlmCorpus.unigramScore(refDocs, cnt, stats), Seq("doc_id"))
    val cuts = CacheScope.pin(LlmCorpus.pplCutoffs(scoredRef))
    (cnt, stats, cuts)
  }

  /** Start the bucketing query: each micro-batch of `docs` (doc_id,
    * lang, text) is scored against the trained LM, bucketed against
    * the frozen cutoffs, and handed to `emit`. */
  def start(docs: DataFrame, cnt: DataFrame, stats: DataFrame,
      cuts: DataFrame, emit: DataFrame => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val scored = batch.select(col("doc_id"), col("lang"))
            .join(LlmCorpus.unigramScore(batch, cnt, stats), Seq("doc_id"))
          emit(LlmCorpus.bucketByCutoffs(scored, cuts))
        }
      }
      .start()
  }
}
