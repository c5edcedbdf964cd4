package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense time-bin resampling: aggregate events into fixed-width bins
  * per key, EMITTING EMPTY BINS between each key's first and last
  * event — the downsample-to-regular-grid operator every telemetry /
  * time-series pipeline needs (a sparse groupBy leaves holes exactly
  * where a dashboard or a forecasting model needs zeros, and a
  * carried-forward value needs a row to ride on).
  *
  * Plan shape at scale: one aggregate to the sparse (key, bin) grain,
  * one per-key (min, max) aggregate whose `sequence()` explode emits
  * each key's bin universe — O(span/width) rows per key, bounded by
  * the clock, not the data — and one equi-join of universe to sparse
  * bins. No window over raw events; the only per-event pass is the
  * first aggregate's map-side combine. The `maxBinsPerKey` guard
  * fails loudly when a mis-scaled width would explode the universe
  * (same contract as the interval joins' expansion cap).
  */
object Resample {

  /** Per-(keys, bin) dense counts and sums of `valueCol`: one row for
    * EVERY `widthSec`-wide bin between each key's first and last
    * event, zeros where no event landed. `bin_start` is the bin's
    * epoch-truncated timestamp. Rows with a NULL key or time are
    * dropped (they have no place on any key's grid). `ffill` adds a
    * `last_value` column: the most recent bin's value-sum carried
    * forward across empty bins (a running `last` over the O(bins)
    * dense grid, not over raw events). */
  def timeBins(df: DataFrame, on: Seq[String], time: String,
      valueCol: String, widthSec: Long,
      maxBinsPerKey: Option[Long] = None,
      ffill: Boolean = false): DataFrame = {
    require(widthSec > 0, s"widthSec must be positive, got $widthSec")
    val reserved = Seq("__bin", "__b0", "__b1", "bin_start", "n_events",
      "sum_value", "last_value")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"resample: column names ${clash.mkString(", ")} are reserved")
    val B = "__bin"
    val w = lit(widthSec)
    // TIMESTAMP_NTZ cannot cast to BIGINT directly in Spark 4 — hop
    // through TIMESTAMP (sessions pin UTC, the hop is exact)
    val keyed = df
      .filter(col(time).isNotNull && on.map(col(_).isNotNull).reduce(_ && _))
      .withColumn(B, floor(col(time).cast("timestamp").cast("long") / w))
    val sparse = keyed.groupBy((on.map(col) :+ col(B)): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
    val span = keyed.groupBy(on.map(col): _*)
      .agg(min(col(B)).as("__b0"), max(col(B)).as("__b1"))
    val guarded = maxBinsPerKey match {
      case Some(cap) => span.withColumn("__b1",
        when(assert_true(col("__b1") - col("__b0") < lit(cap),
          concat(lit("resample: a key spans "),
            col("__b1") - col("__b0") + lit(1L),
            lit(s" bins > maxBinsPerKey $cap at widthSec $widthSec — " +
              "widen the bin or split the key range"))).isNull,
          col("__b1")))
      case None => span
    }
    val universe = guarded
      .select((on.map(col) :+
        explode(sequence(col("__b0"), col("__b1"))).as(B)): _*)
    val dense = universe.join(sparse, on :+ B, "left")
      .select((on.map(col) :+
        timestamp_seconds(col(B) * w).as("bin_start") :+
        coalesce(col("n_events"), lit(0L)).as("n_events") :+
        coalesce(col("sum_value"), lit(0.0)).as("sum_value")): _*)
    if (!ffill) dense
    else {
      val ow = Window.partitionBy(on.map(col): _*).orderBy(col("bin_start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.withColumn("last_value",
        last(when(col("n_events") > 0, col("sum_value")),
          ignoreNulls = true).over(ow))
    }
  }
}
