package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LlmPrep

/** Streaming eval-set decontamination — the streaming twin of
  * [[graft.operators.LlmPrep.contamination]], in the shape a corpus
  * INGEST pipeline actually runs it: the eval set is fixed and small
  * (its gram index is a STATIC frame, broadcast-joinable), while train
  * documents arrive as a stream and each micro-batch's docs are
  * checked against the index the moment they land.
  *
  * The operator is deliberately STATELESS — `foreachBatch` over a
  * per-batch kernel, not a streaming aggregation. A document's grams
  * all travel in its own row, so every (eval_id, train_id) pair is
  * complete within the batch that carries the train doc; a streaming
  * `groupBy.count` would add nothing but unbounded state (every pair
  * ever seen, kept forever — no watermark can bound it because the
  * stream has no event time) and a double-count hazard (an
  * at-least-once source redelivering a doc in a LATER batch would ADD
  * to the stored count; within one batch the kernel's distinct-gram
  * sets make redelivery idempotent ... the per-batch shape makes the
  * cross-batch case the sink's dedup problem, where it belongs).
  *
  * The batch operator's TRAIN-side df cap has no streaming equivalent
  * (document frequency over an unbounded stream is unknowable at join
  * time) and is not needed for boundedness here: per-gram join fan-out
  * is capped by the eval set's df, which is small by construction.
  * Parity with the batch operator therefore holds at dfCap = ∞
  * (StreamingContaminationSpec asserts it); a production deployment
  * wanting boilerplate suppression would pre-filter the eval index by
  * its OWN df instead.
  *
  * Tokenization and gram construction are [[LlmPrep.ngrams]] — the
  * same code the batch operator runs, so the two sides cannot drift.
  */
object StreamingContamination {

  /** Static eval-set gram index: (gram, eval_id) postings — the
    * distinct n-grams of the eval documents. PINNED: the index sits on
    * the static side of every micro-batch's join for the lifetime of
    * the query — without the cache each batch would re-read and
    * re-shingle the eval corpus. */
  def evalIndex(evalDocs: DataFrame, n: Int = LlmPrep.ContamN)
      : DataFrame =
    graft.operators.CacheScope.pin(
      LlmPrep.ngrams(evalDocs, n)
        .select(col("doc_id").as("eval_id"),
          explode(col("grams")).as("gram")))

  /** The per-batch kernel: one train batch × the static index →
    * (eval_id, train_id, n_shared) pairs at/above `minShared`. Pure
    * batch plan (equi-join on the gram + map-side-combined count);
    * also what the parity spec compares against the batch operator. */
  def pairsOfBatch(trainBatch: DataFrame, index: DataFrame,
      n: Int = LlmPrep.ContamN,
      minShared: Int = LlmPrep.ContamMinShared): DataFrame =
    LlmPrep.ngrams(trainBatch, n)
      .select(col("doc_id").as("train_id"),
        explode(col("grams")).as("gram"))
      .join(index, Seq("gram"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Start the ingest query: each micro-batch of `trainDocs` is run
    * through [[pairsOfBatch]] and handed to `emit` (append a parquet
    * table, alert, quarantine the doc ids — the caller's policy). */
  def start(trainDocs: DataFrame, index: DataFrame,
      emit: DataFrame => Unit,
      checkpoint: Option[String] = None,
      n: Int = LlmPrep.ContamN,
      minShared: Int = LlmPrep.ContamMinShared): StreamingQuery = {
    val w = trainDocs.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) emit(pairsOfBatch(batch, index, n, minShared))
      }
      .start()
  }
}
