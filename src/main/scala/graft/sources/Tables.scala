package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet test tables (TESTDATA.md).
  *
  * Mirrors the reference's extract layer (SURVEY §2.1 S1–S6): in the
  * reference every source lands as a flat table after predicate/projection
  * pushdown (`ref/RCO_Maple_orchestrator.R:36-41`); here the analogous
  * pushdown is Catalyst's parquet filter/column pruning, which is applied
  * automatically as long as we keep plans declarative.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** events.parquet carries ns-precision timestamps, which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, so `ts` arrives as a
    * LongType of epoch-nanos here and is truncated to a µs timestamp with
    * integer arithmetic (`div` — ns values exceed 2^53, double math would
    * corrupt them). DuckDB reads the same column as TIMESTAMP_NS natively,
    * so both engines see identical µs/second truncations. */
  def events(s: SparkSession, d: String): DataFrame = {
    // The driver may hand us a session without this conf (it is a
    // runtime-settable SQLConf); without it the ns-timestamp read
    // throws [PARQUET_TYPE_ILLEGAL] before reaching the else-branch.
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = read(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
