package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.sinks.ParquetSinks

/** Continuous load: stream aggregates → the batch upsert sinks.
  *
  * In Update mode each micro-batch emits only the windows the batch
  * CHANGED — so the sink must replace stored rows by EXACT window
  * identity (`keyCol`, `window_start`) via
  * [[ParquetSinks.upsertByKeyBucketed]]. The batch path's windowed
  * delete (`time >= min(batch)`) would be wrong here: a batch that
  * reopens only an older window (late data inside the watermark) would
  * wipe the same key's LATER stored windows without re-supplying them —
  * a batch recompute re-emits everything after the window start, an
  * Update-mode micro-batch does not. Reopened windows replace their
  * stored rows, untouched windows survive, and a replayed batch
  * (checkpoint recovery) lands idempotently. This is the streaming
  * counterpart of the batch `RcoEtl.load` path — same idempotency
  * contract, state bounded by the upstream watermark.
  *
  * The BUCKETED merge matters here more than anywhere in the batch
  * path: this sink fires once per micro-batch, forever, so the flat
  * variant's full-table rewrite would make every trigger O(table) —
  * the table grows, the trigger slows, the stream falls behind. With
  * the hash-bucket layout each trigger reads back and rewrites only
  * the buckets its keys land in, so trigger cost tracks batch size,
  * not table age.
  */
object StreamingLoad {

  /** Start a query that merges each micro-batch of `agg` (a windowed
    * aggregate such as [[StreamingRuntime]]'s output, carrying
    * `window_start`) into the parquet table at `path`, keyed by
    * (`keyCol`, `window_start`) — exact window identity, see above. */
  def upsertTo(agg: DataFrame, path: String, checkpoint: String,
      keyCol: String = "LINE"): StreamingQuery =
    agg.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ParquetSinks.upsertByKeyBucketed(batch.sparkSession, batch, path,
            Seq(keyCol, "window_start"), bucketCol = keyCol)
      }
      .start()
}
