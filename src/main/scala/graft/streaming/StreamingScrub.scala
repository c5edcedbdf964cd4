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
  * Both operators are pure row-local projections (fused kernels and
  * regex scans — no state, no watermark, no shuffle), so they apply to
  * a streaming frame UNCHANGED — [[scrubbed]]/[[screened]] are the
  * batch operators and StreamingScrubSpec asserts the batch/stream
  * outputs are identical. Only the composed GATE (keep docs that pass
  * the screens, emit them redacted) runs per-batch via `foreachBatch`:
  * the compose point needs a doc's clean text next to its repetition
  * flag, which on a pure stream would be a stream-stream self-join
  * (watermark state for no reason — both sides derive from the same
  * row); per-batch it is a plain batch join, complete within the batch
  * that carries the doc, so redelivery stays the sink's dedup problem
  * exactly as in [[StreamingContamination]].
  */
object StreamingScrub {

  /** PII scrub on a stream — streaming-safe as-is (pure projection). */
  def scrubbed(docs: DataFrame): DataFrame = LlmPrep.piiScrub(docs)

  /** Repetition screens on a stream — streaming-safe as-is. */
  def screened(docs: DataFrame): DataFrame = LlmText.repetition(docs)

  /** The per-batch gate kernel: docs passing every repetition screen,
    * with PII redacted — (doc_id, clean_text, pii_found). Also what
    * the parity spec compares against the batch composition. */
  def gateOfBatch(batch: DataFrame): DataFrame =
    LlmPrep.piiScrub(batch)
      .join(LlmText.repetition(batch)
        .filter(col("repetitive") === 0).select("doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("clean_text"), col("pii_found"))

  /** Start the ingest query: each micro-batch of `docs` is gated and
    * handed to `emit` (append the clean shard, route rejects — the
    * caller's policy). */
  def start(docs: DataFrame, emit: DataFrame => Unit,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) emit(gateOfBatch(batch))
      }
      .start()
  }
}
