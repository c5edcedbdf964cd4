package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{LlmPrep, LlmText}

/** Streaming ingest cleaning — the twin of the batch scrub/screen
  * stage ([[graft.operators.LlmPrep.piiScrub]] +
  * [[graft.operators.LlmText.repetition]]), in the shape a corpus
  * ingest actually runs it: documents arrive as a stream and each is
  * redacted and quality-screened the moment it lands, BEFORE anything
  * downstream (dedup indexes, tokenizers, shards) sees its bytes.
  *
  * Everything here is a pure row-local projection (fused kernels and
  * regex scans — no state, no watermark, no shuffle, no join), so the
  * WHOLE stage applies to a streaming frame unchanged: [[gate]]
  * filters on the column-level
  * [[graft.operators.LlmText.passesRepetition]] screen and scrubs the
  * survivors in one plan — per micro-batch that is a single scan of
  * the source, and StreamingScrubSpec asserts the batch/stream
  * outputs are identical on any batch split. Docs the screens reject
  * (including empty docs, which fail by definition) simply don't
  * appear in the gated output; an ingest routing rejects would run
  * the complement filter as a second sink on the same stream.
  *
  * The screen thresholds are corpus-tuned (see
  * [[graft.operators.LlmText.RepTopWordMax]]) — a short-form corpus
  * passes wider ones through [[gate]]/[[start]] explicitly.
  */
object StreamingScrub {

  /** PII scrub on a stream — streaming-safe as-is (pure projection). */
  def scrubbed(docs: DataFrame): DataFrame = LlmPrep.piiScrub(docs)

  /** Repetition screens on a stream — streaming-safe as-is. */
  def screened(docs: DataFrame): DataFrame = LlmText.repetition(docs)

  /** The gate: docs that clear every repetition screen, redacted —
    * (doc_id, clean_text, pii_found). One projection + filter, valid
    * on batch and streaming frames alike (the spec compares the two). */
  def gate(docs: DataFrame,
      topWordMax: Double = LlmText.RepTopWordMax,
      top2Max: Double = LlmText.RepTop2Max,
      dup3Max: Double = LlmText.RepDup3Max): DataFrame =
    LlmPrep.piiScrub(docs.filter(
      LlmText.passesRepetition(col("text"), topWordMax, top2Max,
        dup3Max)))
      .select(col("doc_id"), col("clean_text"), col("pii_found"))

  /** Start the ingest query: each micro-batch's gated docs are handed
    * to `emit` (append the clean shard — the caller's policy; the
    * `foreachBatch` here is only the sink adapter, the gate itself is
    * part of the streaming plan). */
  def start(docs: DataFrame, emit: DataFrame => Unit,
      checkpoint: Option[String] = None,
      topWordMax: Double = LlmText.RepTopWordMax,
      top2Max: Double = LlmText.RepTop2Max,
      dup3Max: Double = LlmText.RepDup3Max): StreamingQuery = {
    val w = gate(docs, topWordMax, top2Max, dup3Max).writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) emit(batch)
      }
      .start()
  }
}
