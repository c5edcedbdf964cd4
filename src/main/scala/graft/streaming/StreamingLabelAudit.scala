package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CacheScope, LlmSim}

/** Streaming label audit — the streaming twin of
  * [[graft.operators.LlmSim.labelNoise]], in the shape a labeled-data
  * pipeline actually runs it: the TRUSTED corpus is fixed (its labeled
  * cell projection is a static, pinned frame), while newly labeled
  * vectors arrive as a stream and each micro-batch is screened against
  * the trusted neighbors the moment it lands — mislabel suspects are
  * flagged before they ever join the training set.
  *
  * Stateless by the same argument as [[StreamingContamination]]: a
  * vector's verdict depends only on its own embedding and the static
  * reference, so every verdict is complete within the batch that
  * carries the vector — `foreachBatch` over the shared batch kernel,
  * no streaming state, redelivery idempotent (same vector → same
  * verdict; cross-batch dedup is the sink's job).
  *
  * The kernel IS [[LlmSim.labelVerdicts]] — the code the batch screen
  * runs — so the two sides cannot drift; StreamingLabelAuditSpec
  * asserts streamed ≡ batch on the self-screen case (reference = the
  * streamed corpus itself) across arbitrary batch splits.
  */
object StreamingLabelAudit {

  /** Static trusted reference: the pinned labeled+cell projection the
    * stream joins against. PINNED for the lifetime of the query —
    * without the cache every micro-batch would re-read and re-project
    * the reference corpus. `cellDims` must match the value given to
    * [[verdictsOfBatch]] (the cell is the join key). */
  def refIndex(refEmbeddings: DataFrame,
      cellDims: Int = LlmSim.IvfDims): DataFrame =
    CacheScope.pin(LlmSim.labeled(refEmbeddings, cellDims))

  /** The per-batch kernel: one labeled batch × the static reference →
    * one (vec_id, label, neigh_label, agree) verdict per batch vector
    * with at least one same-cell reference neighbor. */
  def verdictsOfBatch(batch: DataFrame, index: DataFrame,
      k: Int = LlmSim.LabelK,
      cellDims: Int = LlmSim.IvfDims): DataFrame =
    LlmSim.labelVerdicts(LlmSim.labeled(batch, cellDims), index, k)

  /** Start the audit query: each micro-batch of `labeledVecs`
    * (vec_id, embedding, label) is screened via [[verdictsOfBatch]]
    * and handed to `emit` (quarantine suspects, append an audit
    * table — the caller's policy). */
  def start(labeledVecs: DataFrame, index: DataFrame,
      emit: DataFrame => Unit,
      checkpoint: Option[String] = None,
      k: Int = LlmSim.LabelK,
      cellDims: Int = LlmSim.IvfDims): StreamingQuery = {
    val w = labeledVecs.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          emit(verdictsOfBatch(batch, index, k, cellDims))
      }
      .start()
  }
}
