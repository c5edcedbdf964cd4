package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: JDBC extract with predicate/projection pushdown and partitioned
  * parallel reads — the engine-side reformulation of the reference's
  * database extracts (`ref/RCO_Maple_orchestrator.R:36-41` RODBC
  * `sqlQuery`, `App/etl/extract/data_from_mdc.py` per-site `querySL`/
  * `queryML` SQL strings).
  *
  * The reference pulls each table through a single connection on one
  * machine. At 100 TB that single pipe is the bottleneck, so the scale
  * path here is [[readPartitioned]]: Spark's JDBC source splits the key
  * range into `numPartitions` slices and issues one range-bounded query
  * per executor task, giving a parallel extract whose fan-in is the
  * database's own capacity, not the driver. Filters applied on the
  * returned DataFrame are pushed into the generated SQL's WHERE clause
  * (visible as `PushedFilters` in the physical plan — asserted by
  * JdbcSpec against an embedded Derby), so selective extracts ship only
  * matching rows over the wire, matching the reference's hand-written
  * per-site WHERE clauses without hand-writing them.
  */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole-table read through one connection (small dims / configs). */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** The reference's querySL/queryML shape: extract an arbitrary SQL
    * statement's result. Spark wraps it as a derived table, and still
    * pushes DataFrame-level filters/projections into the outer query. */
  def readQuery(spark: SparkSession, url: String, sql: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("query", sql)
      .options(options).load()

  /** Range-partitioned parallel extract: `numPartitions` concurrent
    * range-bounded queries over `partitionColumn` ∈ [lower, upper].
    * This is the 1000-executor extract plan — each task reads its own
    * slice, no driver-side funnel. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty)
      : DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper,
      numPartitions, props(options))
}
