package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{CacheScope, TemporalJoins}

/** Streaming as-of enrichment — the streaming twin of
  * [[graft.operators.TemporalJoins.asofBackward]], in the shape a
  * production pipeline runs it: the right side is a slowly-changing
  * dimension pinned as a STATIC snapshot (a price list, a config
  * history, the brandcode master), while fact events arrive as a
  * stream and each micro-batch is enriched with the latest dimension
  * row at-or-before its event time the moment it lands.
  *
  * Stateless by the same argument as [[StreamingContamination]]: with
  * the dimension static, a row's match depends only on its own
  * timestamp and the snapshot, so every enrichment is complete within
  * the batch that carries the row — `foreachBatch` over the shared
  * batch kernel, no streaming state, redelivery idempotent (same row →
  * same match). The kernel IS [[TemporalJoins.asofBackward]], so the
  * two sides cannot drift; StreamingAsOfSpec asserts streamed ≡ batch
  * across arbitrary batch splits.
  *
  * Scope note: this is the pinned-snapshot variant. When the
  * dimension ALSO streams, use [[StreamingAsOfDual]] (keyed
  * newest-version state, ordered-arrival contract); when it
  * legitimately changes mid-query outside that contract, restart with
  * a fresh snapshot or run the batch operator over closed windows.
  */
object StreamingAsOf {

  /** Pin the dimension snapshot for the lifetime of the query —
    * without the cache every micro-batch would re-read it. The right
    * side must be unique per (on, rightTime), same contract as the
    * batch operator. */
  def dimSnapshot(dim: DataFrame): DataFrame = CacheScope.pin(dim)

  /** The per-batch kernel: one fact batch × the static snapshot. */
  def enrichBatch(
      batch: DataFrame,
      dim: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None,
      asofTsCol: String = "asof_ts"): DataFrame =
    TemporalJoins.asofBackward(
      batch, dim, on, leftTime, rightTime, tolerance, asofTsCol)

  /** Start the enrichment query: each micro-batch of `facts` is
    * enriched via [[enrichBatch]] and handed to `emit` (append to the
    * enriched table — the caller's policy). */
  def start(
      facts: DataFrame,
      dim: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      emit: DataFrame => Unit,
      checkpoint: Option[String] = None,
      tolerance: Option[Long] = None,
      asofTsCol: String = "asof_ts"): StreamingQuery = {
    val w = facts.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          emit(enrichBatch(batch, dim, on, leftTime, rightTime,
            tolerance, asofTsCol))
      }
      .start()
  }
}
