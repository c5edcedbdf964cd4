package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous heavy-hitter telemetry — the streaming twin of
  * [[graft.operators.HeavyHitters]]: every arriving micro-batch folds
  * into its own KB-sized Misra-Gries shard, and the current
  * whole-history candidate set is one read-and-merge over the shard
  * directory — no rescan of the stream's history, ever.
  *
  * Same shard layout discipline as [[StreamingProfile]]: batch N's
  * sketch lands at `dir/batch_id=N` under dynamic partition
  * overwrite, so a foreachBatch redelivery REPLACES the shard instead
  * of double-counting it — exactly-once from the LAYOUT, no state
  * store.
  *
  * Why summed shards are still a valid sketch (the merge the reader
  * runs is explode + sum per key, NOT the capacity-compressing
  * in-aggregate merge):
  *  - error bound: shard i's estimates undercount by at most
  *    `n_i/(cap+1)`, so the summed estimate undercounts by at most
  *    `Σ n_i/(cap+1) = n/(cap+1)` — the batch bound, unchanged;
  *  - containment: a key absent from EVERY shard has per-shard
  *    frequency ≤ `n_i/(cap+1)`, hence total ≤ `n/(cap+1)` — so any
  *    key with total frequency above the bound survives in at least
  *    one shard.
  * The merged counter set is ≤ shards·capacity rows — shard-directory
  * scale, not key-space scale.
  */
object StreamingHeavyHitters {

  /** Start sketching `stream` (any streaming DataFrame): each batch's
    * `graft_mg_agg` over `xxhash64(key)` is one shard row. */
  def start(stream: DataFrame, key: Column, dir: String, capacity: Int,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) writeShard(batch, key, dir, batchId, capacity)
      }
      .start()
  }

  /** Write one batch's sketch shard (exposed for the spec's
    * redelivery case). */
  def writeShard(batch: DataFrame, key: Column, dir: String,
      batchId: Long, capacity: Int): Unit =
    batch
      .agg(call_function("graft_mg_agg", xxhash64(key), lit(capacity))
        .as("sk"))
      .select(col("sk.counts").as("counts"), col("sk.n").as("n"),
        lit(batchId).as("batch_id"))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)

  /** Whole-history candidate set at fraction `minFrac`:
    * `(key_hash, est, n_total)` for every merged counter that could
    * still reach `ceil(minFrac * n_total)` — provably a SUPERSET of
    * the true heavy hitters (see the containment argument above).
    * `minFrac > 1/(capacity+1)` must hold, same static guarantee as
    * the batch operator; an exact second pass over the corpus (the
    * caller's, if it retains one) finishes the job exactly as
    * [[graft.operators.HeavyHitters.exactFraction]] does. */
  def currentCandidates(spark: SparkSession, dir: String, minFrac: Double,
      capacity: Int): DataFrame = {
    require(minFrac > 0 && minFrac < 1,
      s"streamingHeavyHitters: minFrac must be in (0, 1), got $minFrac")
    require(minFrac * (capacity + 1L) > 1.0,
      s"streamingHeavyHitters: minFrac $minFrac is not above " +
        s"1/(capacity+1) = 1/${capacity + 1}")
    val shards = spark.read.parquet(dir)
    val merged = shards
      .select(explode(col("counts")).as(Seq("key_hash", "est")))
      .groupBy(col("key_hash")).agg(sum(col("est")).as("est"))
    val totals = shards.agg(sum(col("n")).as("n_total"))
    merged.crossJoin(broadcast(totals))
      .filter(col("est") + (col("n_total") / lit(capacity + 1L))
        .cast("long") >=
        ceil(lit(minFrac) * col("n_total")).cast("long"))
      .select(col("key_hash"), col("est"), col("n_total"))
  }
}
