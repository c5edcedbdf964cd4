package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming runtime-per-window: the A3 runtime aggregate as a
  * Structured Streaming event-time window with a watermark — the
  * streaming twin of [[graft.operators.ProdOps.runtimePerDay]] for
  * deployments that tail the downtime log instead of re-extracting it.
  *
  * The watermark bounds state: windows older than the allowed lateness
  * are finalized and dropped from the store, so state is
  * O(lines × open windows) regardless of stream length — the
  * structured-streaming counterpart of the reference's T1 lookback /
  * T2 late-data reconciliation pair (late events inside the lateness
  * bound still update their window; later ones are dropped rather than
  * corrupting finalized results).
  */
object StreamingRuntime {

  /** @param events       streaming canonical log (START_TIME, LINE,
    *                      UPTIME, DOWNTIME)
    * @param windowLength aggregation window, e.g. "1 day"
    * @param lateness     watermark delay, e.g. "2 hours" */
  def apply(events: DataFrame, windowLength: String = "1 day",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("START_TIME", lateness)
      .groupBy(window(col("START_TIME"), windowLength), col("LINE"))
      .agg(round(sum(col("UPTIME")), 4).as("Runtime"),
        round(sum(col("DOWNTIME")), 4).as("Production_MSU"))
      .select(col("window.start").as("window_start"), col("LINE"),
        col("Runtime"), col("Production_MSU"))
}
