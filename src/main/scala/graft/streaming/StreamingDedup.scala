package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming D1: multi-constraint dedup on (LINE, START_TIME) over a
  * live event tail — the streaming twin of
  * [[graft.model.Rco.downtimeLogDeduped]]'s dedup step.
  *
  * A constraint event arrives once per constraint machine; batch D1
  * keeps one row per (LINE, START_TIME). On a stream the same
  * collision appears as near-simultaneous duplicates, possibly split
  * across micro-batches, so plain per-batch dropDuplicates misses the
  * cross-batch half. `dropDuplicatesWithinWatermark` keys the dedup
  * state by (LINE, START_TIME) and keeps it only within the watermark
  * bound — state is O(lines × in-flight window), not O(stream), the
  * same bounded-state argument as [[StreamingRuntime]].
  */
object StreamingDedup {

  /** @param events   streaming canonical log carrying LINE, START_TIME
    * @param lateness watermark delay bounding how far apart duplicate
    *                 halves may arrive, e.g. "10 minutes" */
  def apply(events: DataFrame, lateness: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark("START_TIME", lateness)
      .dropDuplicatesWithinWatermark(Seq("LINE", "START_TIME"))
}
