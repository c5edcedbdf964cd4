package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.CooccurIngest

/** Streaming face of [[CooccurIngest]]: (user, item) interactions
  * stream in, each micro-batch folds into the maintained
  * basket/pair-count/item-count state, and [[CooccurIngest.view]]
  * serves the live co-occurrence answer — identical to the batch
  * [[graft.operators.ClassicQueries.itemCooccur]] over everything
  * ingested so far — at any time. Same epoch-ledger discipline as
  * [[StreamingEntityResolution]]: with a checkpoint the epoch id IS
  * the replay ledger id; without one each run salts the ledger so
  * intra-run retries still dedup. */
object StreamingCooccur {

  def start(df: DataFrame, path: String, userCol: String,
      itemCol: String,
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
          CooccurIngest.ingest(batch.sparkSession, batch, path,
            userCol, itemCol, s"${ns}_$epochId")
      }
      .start()
  }
}
