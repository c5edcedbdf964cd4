package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{LlmIngest, LlmSim}

/** Streaming VECTOR ingest — [[StreamingIngest]]'s embedding-side
  * sibling, the continuous vector-database ingestion loop: a pure
  * streaming gate drops degenerate vectors, then each micro-batch is
  * cosine-deduped against the PERSISTED quantizer-cell index
  * ([[graft.operators.LlmIngest.ingestVectors]]) and the index extended
  * with the survivors before the accepted vectors reach the caller's
  * sink.
  *
  * The gate rejects zero vectors: they carry no direction, so cosine
  * against them is undefined (NULL in the dedup filter) — unscreened,
  * a zero vector would be accepted into the index forever and never
  * match anything. The gate is one codegen'd projection+filter with no
  * state or shuffle, so it lives in the streaming plan; the dedup is a
  * stateful table operation and lives in `foreachBatch`, exactly the
  * [[StreamingIngest]] split.
  *
  * Per micro-batch the work is O(batch + touched index buckets) — the
  * ScaleProbe `vecingest` section's measured claim — so batch latency
  * stays flat as the accepted index grows (at a codebook sized for the
  * corpus; see the `cellDims` contract on `ingestVectors`). Crash
  * recovery and ordering inherit the [[StreamingIngest]] argument
  * verbatim: re-ingest is a proven no-op, a near-dup pair split across
  * micro-batches keeps the first-arrived vector, and within a batch
  * the smaller vec_id wins — identical to hand-running
  * `ingestVectors` per split, which StreamingVecIngestSpec asserts.
  */
object StreamingVecIngest {

  /** Pure streaming gate: drop vectors with zero (or NaN-poisoned)
    * norm. `graft_dot(v, v)` is the squared norm; `> 0` is false for
    * both 0.0 and NaN, so either degenerate shape is dropped. */
  def gate(vecs: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    vecs.filter(call_function("graft_dot", v, v) > 0)
  }

  /** One micro-batch: dedup `batch` (vec_id, embedding) against the
    * index at `indexPath`, extend the index, return the accepted
    * rows. */
  def ingestBatch(batch: DataFrame, indexPath: String,
      threshold: Double = LlmSim.EmbedDupThreshold,
      cellDims: Int = LlmSim.IvfDims): DataFrame =
    LlmIngest.ingestVectors(batch.sparkSession, batch, indexPath,
      threshold, cellDims)

  /** Start the ingest query: gate → per-batch index dedup →
    * `emit(accepted)`. */
  def start(vecs: DataFrame, indexPath: String,
      emit: DataFrame => Unit,
      checkpoint: Option[String] = None,
      threshold: Double = LlmSim.EmbedDupThreshold,
      cellDims: Int = LlmSim.IvfDims): StreamingQuery = {
    val w = gate(vecs).writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          emit(ingestBatch(batch, indexPath, threshold, cellDims))
      }
      .start()
  }
}
