package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.AggMaintain

/** Continuously-maintained aggregate table: the streaming face of
  * [[graft.sinks.AggMaintain]] — each micro-batch folds into the
  * per-key mergeable-partials state table, so the materialized
  * summary (count/sum/avg/stddev/min/max per key) tracks the stream
  * with O(batch) work per trigger and no re-scan of history. This is
  * the "live metrics table" shape: readers hit
  * [[AggMaintain.readView]] at any time and see every completed
  * batch.
  *
  * Exactly-once: the foreachBatch epoch id IS the AggMaintain batch
  * id, so the at-least-once replay Structured Streaming guarantees
  * after a crash meets the sink's `_applied/` ledger and folds each
  * epoch exactly once — the same contract AggMaintainSpec pins for
  * the batch API, exercised across a real stream restart in
  * StreamingAggMaintainSpec.
  *
  * State growth is O(distinct keys), not O(rows): the state table IS
  * the aggregate. A key-explosive stream wants the same bucketed
  * layout the sink already writes (key-hash buckets, touched-bucket
  * rewrites), which is what keeps the per-trigger cost batch-bounded
  * at any key cardinality.
  */
object StreamingAggMaintain {

  /** Start maintaining `path` from the stream: every micro-batch is
    * reduced to per-key partials and merged into the state table.
    * `df` must carry `keyCol` and `valueCol`.
    *
    * Ledger namespacing: WITH a checkpoint, epoch ids are stable
    * across restarts, so the bare epoch is the ledger id and recovery
    * is exactly-once. WITHOUT one, a restarted query renumbers its
    * batches from 0 — bare epoch ids would collide with the previous
    * run's markers and silently DROP the first batches of new data —
    * so each uncheckpointed `start` salts the ledger with a fresh
    * run token: intra-run foreachBatch retries still dedup (same
    * token), and a restart folds everything it is re-sent (which,
    * with no checkpoint, is the at-least-once contract the caller
    * already accepted). */
  def start(df: DataFrame, path: String, keyCol: String,
      valueCol: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val ns = checkpoint match {
      case Some(_) => "epoch"
      case None => "run" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
    }
    val w = df.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty)
          AggMaintain.maintain(batch.sparkSession, batch, path, keyCol,
            valueCol, s"${ns}_$epochId")
      }
      .start()
  }
}
