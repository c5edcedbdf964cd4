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
    * `df` must carry `keyCol` and `valueCol`. */
  def start(df: DataFrame, path: String, keyCol: String,
      valueCol: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = df.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty)
          AggMaintain.maintain(batch.sparkSession, batch, path, keyCol,
            valueCol, s"epoch_$epochId")
      }
      .start()
  }
}
