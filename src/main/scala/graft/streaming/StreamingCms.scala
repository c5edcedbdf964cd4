package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LlmSketch
import graft.sinks.AggMaintain

/** Streaming twin of [[LlmSketch]]: the Count-Min sketch maintained
  * continuously over a document stream. CMS cells are ADDITIVE keyed
  * sums — `cells(A ∪ B) = cells(A) ⊕ cells(B)` cell-wise — so the
  * sketch is exactly the [[AggMaintain]] incremental-materialized-view
  * shape: each micro-batch folds its own (cell → count) increments
  * into the bucketed state table, O(batch + depth×width) per batch,
  * never a history re-scan, exactly-once under replay via the
  * `_applied/` batch ledger. StreamingCmsSpec proves streamed ≡ batch
  * [[LlmSketch.cmsCells]] across random chops and a replayed epoch.
  *
  * The state row for a cell carries AggMaintain's mergeable partials;
  * the CMS count is `agg_sum`. [[estimates]] reads point estimates
  * for a probe vocabulary straight off the state table (min over the
  * depth rows), so a monitoring job can ask "roughly how often has
  * token X appeared so far" without ever touching the corpus.
  */
object StreamingCms {

  /** Flat cell id (the state table's key): `d * width + bucket`. */
  private def cellId(d: org.apache.spark.sql.Column,
      bucket: org.apache.spark.sql.Column, width: Int) =
    (d.cast("long") * width + bucket).as("cell_id")

  /** One batch reduced to (cell_id, n) increments. */
  private[graft] def cellIncrements(batch: DataFrame, textCol: String,
      depth: Int, width: Int): DataFrame = {
    import graft.operators.LlmSketch.bucketOf
    LlmSketch.tokenCounts(batch, textCol)
      .select(col("tok"), col("n"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .groupBy(cellId(col("d"),
        bucketOf(col("d"), col("tok"), width), width))
      .agg(sum(col("n")).as("n"))
  }

  def start(documents: DataFrame, path: String,
      textCol: String = "text", depth: Int = LlmSketch.CmsDepth,
      width: Int = LlmSketch.CmsWidth,
      checkpoint: Option[String] = None): StreamingQuery = {
    val ns = checkpoint match {
      case Some(_) => "epoch"
      case None => "run" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
    }
    val w = documents.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            epochId: Long) =>
        if (!batch.isEmpty)
          AggMaintain.maintain(batch.sparkSession,
            cellIncrements(batch.toDF(), textCol, depth, width),
            path, "cell_id", "n", s"${ns}_$epochId")
      }
      .start()
  }

  /** Read the maintained sketch back as `(d, bucket, cnt)` — the
    * [[LlmSketch.cmsCells]] shape. */
  def cells(spark: SparkSession, path: String,
      width: Int = LlmSketch.CmsWidth): DataFrame =
    spark.read.parquet(path)
      .select((col("cell_id") / width).cast("long").as("d"),
        pmod(col("cell_id"), lit(width.toLong)).as("bucket"),
        col("agg_sum").cast("long").as("cnt"))

  /** Point estimates for a probe vocabulary `(tok)` against the
    * maintained sketch: `(tok, est)`, min over the depth rows; a
    * token never folded estimates via its (possibly zero-collision)
    * cells like any other — absent cells mean est 0 is impossible
    * only if some token hashed there, so missing rows read as 0. */
  def estimates(spark: SparkSession, path: String, probes: DataFrame,
      depth: Int = LlmSketch.CmsDepth,
      width: Int = LlmSketch.CmsWidth): DataFrame = {
    import graft.operators.LlmSketch.bucketOf
    probes.select(col("tok"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", bucketOf(col("d"), col("tok"), width))
      .join(cells(spark, path, width), Seq("d", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
