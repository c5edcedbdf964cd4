package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ErIngest

/** Streaming face of [[ErIngest]]: records stream in, each
  * micro-batch folds into the persisted registry (bucket-pruned
  * deletion-key matching, merge-map maintenance), and
  * [[ErIngest.currentEntities]] serves the live assignment at any
  * time. Same epoch-ledger discipline as [[StreamingAggMaintain]]:
  * with a checkpoint the epoch id IS the replay ledger id
  * (exactly-once across restarts); without one each run salts the
  * ledger so intra-run retries still dedup. */
object StreamingEntityResolution {

  def start(df: DataFrame, path: String, idCol: String, strCol: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val ns = checkpoint match {
      case Some(_) => "epoch"
      case None => "run" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
    }
    val w = df.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          ErIngest.ingest(batch.sparkSession, batch, path, idCol,
            strCol, s"${ns}_$epochId")
          ()
        }
      }
      .start()
  }
}
