package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pq

/** Streaming PQ encoding against a FROZEN codebook — the steady-state
  * loop of a compressed vector store: [[graft.operators.Pq.freeze]]
  * trains once from a bootstrap corpus, then every arriving batch is
  * byte-encoded map-only (no shuffle, O(batch)) and appended to the
  * codes table, while a per-batch DRIFT row tracks mean reconstruction
  * error against the bootstrap baseline.
  *
  * The drift signal is the operational half of PQ that toy demos skip:
  * a frozen codebook quantizes tomorrow's distribution with yesterday's
  * centroids, and when the corpus drifts (new language, new embedding
  * model revision), reconstruction error rises and ADC rankings
  * silently degrade. Mean l2sq per batch against the frozen baseline is
  * exactly that thermometer: `drift_ratio` > `retrainRatio` flags the
  * batch (warn-logged and materialized in `path/drift` — never
  * silent), and the pipeline owner schedules the explicit
  * retrain+re-encode migration a codebook change requires.
  *
  * Exactly-once: codes, coarse-cell assignments, and the drift row
  * land in `path/codes/batch_id=<id>` / `path/cells/batch_id=<id>` /
  * `path/drift/batch_id=<id>` via whole-directory overwrite —
  * replaying a batch rewrites the same directories with identical
  * content (encoding against frozen books is deterministic), so
  * redelivery cannot duplicate rows. The cells table is what turns
  * the codes store into a CONTINUOUSLY-GROWING IVF-PQ index:
  * [[graft.operators.Pq.searchIvfIndex]] serves coarse-pruned ADC
  * queries from (codes ⋈ cells) + the frozen books alone.
  * An `_applied` marker (namespace `pqenc`) is the fast-path skip on
  * the hot side, same as the other exactly-once sinks; [[graft.sinks
  * .Ledger.prune]] handles marker retention.
  *
  * The streaming plan itself is stateless ([[StreamingVecIngest.gate]]
  * reused: degenerate zero/NaN vectors dropped before they poison
  * normalization); all table work lives in `foreachBatch`, the
  * [[StreamingIngest]] split.
  */
object StreamingPqEncode {

  /** Default drift threshold: flag when a batch's mean reconstruction
    * error reaches 1.5× the bootstrap baseline. */
  val RetrainRatio = 1.5

  private def applied(spark: SparkSession, path: String,
      batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_applied",
      s"pqenc_$batchId")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def mark(spark: SparkSession, path: String,
      batchId: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/_applied")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, s"pqenc_$batchId"),
      true).close()
  }

  /** Encode one batch against the frozen codebook at `path`, write
    * codes + drift idempotently, return the codes written (read back
    * from the table on a fast-path replay, so `emit` sees identical
    * rows either way). */
  def applyBatch(spark: SparkSession, batch: DataFrame, path: String,
      batchId: Long,
      retrainRatio: Double = RetrainRatio): DataFrame = {
    val codesDir = s"$path/codes/batch_id=$batchId"
    if (applied(spark, path, batchId))
      return spark.read.parquet(codesDir)
    val (cvsL, bbsL) = Pq.frozenCodebook(spark, path)
    // lineage-cut so one computation feeds codes AND drift; released
    // before return (the emitted frame re-reads the written table)
    val codes = Pq.encodeFrozen(batch, cvsL, bbsL)
      .localCheckpoint(true)
    codes.write.mode("overwrite").parquet(codesDir)
    // Coarse-cell assignment rides NEXT TO the codes, under the same
    // marker: [[graft.operators.Pq.searchIvfIndex]] joins
    // codes ⋈ cells at query time, so the streamed IVF-PQ index stays
    // complete batch-by-batch. Map-only against the frozen coarse
    // book; whole-directory overwrite keeps the replay idempotent,
    // and a crash between the codes and cells writes replays both
    // (no marker yet → full redo, both directories overwritten).
    val (cIds, cCvs, cNorms) = Pq.frozenCoarse(spark, path)
    graft.operators.LlmSim.topCellsFrozen(batch, cIds, cCvs, cNorms, 1)
      .select(col("vec_id"), col("cent_id"), col("sim_r"))
      .write.mode("overwrite").parquet(s"$path/cells/batch_id=$batchId")
    val baseline = spark.read.parquet(s"$path/baseline")
      .select(col("avg_l2sq").as("baseline_avg"))
    val drift = codes
      .agg(avg(col("l2sq")).as("avg_l2sq"),
        countDistinct(col("vec_id")).as("n_vecs"))
      .crossJoin(broadcast(baseline))
      .select(
        // batch_id is carried by the partition DIRECTORY
        // (drift/batch_id=<id>), not duplicated inside the files
        col("n_vecs"), col("avg_l2sq"), col("baseline_avg"),
        // guarded: a degenerate zero baseline (toy corpus where every
        // cell is a singleton) yields NULL ratio / retrain 0, not an
        // ANSI division error
        when(col("baseline_avg") > 0,
          round(col("avg_l2sq") / col("baseline_avg"), 6))
          .as("drift_ratio"))
      .withColumn("retrain",
        coalesce((col("drift_ratio") >= retrainRatio).cast("int"),
          lit(0)))
    val driftRow = drift.collect().headOption // one row by construction
    drift.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/drift/batch_id=$batchId")
    driftRow.filter(_.getAs[Int]("retrain") == 1).foreach { r =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"pq-encode batch $batchId: mean reconstruction error " +
          s"${r.getAs[Double]("avg_l2sq")} is " +
          s"${r.getAs[Double]("drift_ratio")}x the frozen baseline " +
          s"(threshold $retrainRatio) — codebook retrain advised")
    }
    mark(spark, path, batchId)
    graft.operators.CacheScope.release(codes)
    spark.read.parquet(codesDir)
  }

  /** Start the encode query: gate → per-batch frozen-codebook encode →
    * `emit(codes)`. [[graft.operators.Pq.freeze]] must have run for
    * `path` first. */
  def start(vecs: DataFrame, path: String,
      emit: DataFrame => Unit,
      checkpoint: Option[String] = None,
      retrainRatio: Double = RetrainRatio): StreamingQuery = {
    val w = StreamingVecIngest.gate(vecs).writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          emit(applyBatch(batch.sparkSession, batch, path, id,
            retrainRatio))
      }
      .start()
  }
}
