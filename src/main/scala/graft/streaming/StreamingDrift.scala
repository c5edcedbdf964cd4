package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Drift
import graft.sinks.AggMaintain

/** Continuous drift monitor — the streaming face of [[Drift]]: a
  * frozen BASELINE distribution (last release's training corpus) is
  * compared against the live stream's per-value counts, which are
  * maintained exactly through [[AggMaintain]]'s bucket-pruned fold +
  * replay ledger (the counts are the only state; the drift report is
  * derived at read time with the identical smoothed kernel, so
  * streamed-then-read ≡ batch [[Drift.categorical]] over everything
  * sent — pinned in StreamingDriftSpec). NULLs map to the same
  * "__null" cell as the batch kernel. */
object StreamingDrift {

  /** Start counting `c` values of the stream into `path`. */
  def start(df: DataFrame, path: String, c: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val ns = checkpoint match {
      case Some(_) => "epoch"
      case None => "run" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
    }
    val w = df.writeStream
    checkpoint.foreach(cp => w.option("checkpointLocation", cp))
    w.foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) fold(batch, path, c, s"${ns}_$epochId")
      }
      .start()
  }

  /** Fold one batch's value counts into the state (exposed for the
    * spec's replay case). */
  def fold(batch: DataFrame, path: String, c: String,
      ledgerId: String): Unit = {
    val keyed = batch.select(
      coalesce(col(c).cast("string"), lit("__null")).as("__dv"),
      lit(1.0).as("__one"))
    AggMaintain.maintain(batch.sparkSession, keyed, path, "__dv",
      "__one", ledgerId)
  }

  /** Drift of the live counts vs a frozen `baseline` snapshot —
    * same output schema as [[Drift.categorical]] with the stream as
    * the `after` side. */
  def currentDrift(spark: SparkSession, path: String,
      baseline: DataFrame, c: String): DataFrame = {
    val bc = baseline.select(
        coalesce(col(c).cast("string"), lit("__null")).as("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
    val live = spark.read.parquet(path)
      .select(col("__dv").as("value"),
        col("agg_cnt").cast("long").as("n"))
    Drift.fromCounts(bc, live)
  }
}
