package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins and aggregations.
  *
  * The reference re-extracts and re-joins the same key spaces every run
  * (line-config × downtime, CO aggregates × event log). At 100 TB the
  * dominant cost of those joins is the shuffle, not the join itself.
  * Writing both sides bucketed by the join key (same column, same
  * bucket count) makes the scan already hash-distributed: Spark's
  * bucketing-aware planner drops the Exchange on BOTH sides, so the
  * sort-merge join reads co-located buckets directly — the cluster
  * analogue of "pre-partition once, join many times". A groupBy on the
  * bucket key likewise aggregates without a shuffle.
  *
  * BucketingSpec asserts the Exchange elimination on the physical plan.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and sorted) by `keys` into
    * the session catalog. `buckets` must match across tables that are
    * joined together — it plays the role of the fixed partition count
    * the pipeline standardizes on. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
}
