package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LlmCorpus

/** Continuous corpus telemetry — the streaming twin of
  * [[LlmCorpus.profileSketch]]: every arriving micro-batch of
  * documents contributes its own mergeable profile shard, and the
  * current whole-history profile (exact doc/token counts + HLL
  * distinct-docs/vocabulary estimates per source) is one
  * read-and-merge over the (KB-sized) shard directory away — no
  * rescan of the corpus, ever.
  *
  * Idempotence comes from the LAYOUT, not from state: each batch's
  * profile lands at `dir/batch_id=N` with dynamic partition
  * overwrite, so a foreachBatch redelivery of batch N REPLACES shard
  * N instead of merging it twice (a second merge would double the
  * count columns — the sketches would absorb the overlap but the sums
  * would not; the shard overwrite makes the whole pipeline
  * exactly-once without any of the columns needing to be). Merging is
  * deferred to [[currentProfile]], which is cheap because a shard is
  * one row per source and a few KB of sketch state.
  *
  * At scale this is the profile a crawl pipeline publishes next to
  * the corpus: per-day shards, any range of days mergeable into a
  * window profile (last-30-days vocabulary, per-quarter dup
  * exposure) — the associativity LlmCorpus.mergeProfiles guarantees
  * and ProfileSketchSpec pins.
  */
object StreamingProfile {

  /** Start profiling `docs` (a streaming DataFrame with the
    * `documents` schema) into `dir/batch_id=N` shards. */
  def start(docs: DataFrame, dir: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) writeShard(batch, dir, batchId)
      }
      .start()
  }

  /** Write one batch's profile shard (exposed for the spec's
    * redelivery case). Dynamic partition overwrite replaces ONLY
    * partition `batch_id=N`, leaving other shards untouched.
    *
    * The profile is built inside a [[graft.operators.CacheScope]]
    * scope and released after the write: profileSketch pins its
    * tokenized frame (two aggregations consume it), and WITHOUT the
    * scope each micro-batch of a long-running stream would leave one
    * more dead cached frame behind — unbounded cache growth on a
    * query that is supposed to run forever. */
  def writeShard(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val (profile, release) =
      graft.operators.CacheScope.collect(LlmCorpus.profileSketch(batch))
    try profile
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)
    finally release()
  }

  /** The whole-history profile: read every shard, merge. mergeSchema:
    * a long-lived shard directory spans profile-schema upgrades (the
    * len_hist column was added after the sketches) — without it Spark
    * picks ONE footer's schema and either fails on the new column or
    * silently NULLs it for old shards depending on which file wins. */
  def currentProfile(spark: SparkSession, dir: String): DataFrame =
    LlmCorpus.mergeProfiles(
      spark.read.option("mergeSchema", "true").parquet(dir)
        .drop("batch_id"))
}
