package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.sinks.ParquetSinks

/** Continuous load: stream aggregates → the batch upsert sinks.
  *
  * In Update mode each micro-batch emits the windows the batch
  * CHANGED — exactly the delete-then-append shape of the reference's
  * T2 reconciliation (`ref/RCO_Overall_orchestrator.R:304-317`), so
  * each batch routes through [[ParquetSinks.upsertWindow]]: reopened
  * windows replace their stored rows, untouched keys' partitions are
  * never rewritten, and a replayed batch (checkpoint recovery) lands
  * idempotently instead of duplicating. This is the streaming
  * counterpart of the batch `RcoEtl.load` path — same sink, same
  * idempotency contract, state bounded by the upstream watermark.
  */
object StreamingLoad {

  /** Start a query that upserts each micro-batch of `agg` (a windowed
    * aggregate such as [[StreamingRuntime]]'s output, carrying
    * `window_start`) into the parquet table at `path`, keyed by
    * `keyCol`. The sink's time axis is epoch seconds derived from
    * `window_start` (the upsert window arithmetic is numeric). */
  def upsertTo(agg: DataFrame, path: String, checkpoint: String,
      keyCol: String = "LINE"): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch
          .withColumn("window_epoch",
            unix_timestamp(col("window_start")).cast("double"))
        if (!rows.isEmpty)
          ParquetSinks.upsertWindow(rows.sparkSession, rows, path,
            keyCol, "window_epoch", padSec = 0.0)
      }
      .start()
}
