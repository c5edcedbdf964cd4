package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Load-side sinks (SURVEY §2.1 S8–S11), re-expressed over parquet
  * tables — the test-bed stand-in for the reference's Azure SQL sinks
  * (SURVEY §7.1 sanctions parquet `replaceWhere`-style here).
  *
  * All sinks are IDEMPOTENT: re-running a load with the same input
  * leaves the table unchanged — that is the reference's whole
  * late-data/reconciliation design (T2: deliberately re-extract
  * overlapping windows, then delete+append,
  * `ref/RCO_Overall_orchestrator.R:304-317`). SinksSpec asserts this.
  *
  * Scale notes: [[upsertWindow]] partitions the table by the upsert key
  * and uses DYNAMIC partition overwrite, so a load rewrites only the
  * partitions it touches — the parquet analogue of the reference's
  * per-line windowed DELETE. Rewritten data is localCheckpoint-ed
  * first because Spark (correctly) refuses plans that overwrite a path
  * they are still reading.
  */
object ParquetSinks {

  private def exists(spark: SparkSession, path: String): Boolean = {
    // Hadoop FileSystem, not java.io.File: a non-local path (hdfs://,
    // s3a://) would otherwise always read as "missing" and every sink
    // would silently degrade to a blind append.
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** S8: schema-aligned append (`App/etl/overall_etl.py:12-43`,
    * `ref/RCO_Overall_orchestrator.R:134-165`): reorder to the live
    * table's column order, fill missing columns with NULL, drop extras,
    * cast to the table's types, append. */
  def appendAligned(spark: SparkSession, df: DataFrame, path: String)
      : Unit =
    if (!exists(spark, path)) df.write.mode(SaveMode.Append).parquet(path)
    else {
      val target = spark.read.parquet(path).schema
      val aligned = df.select(target.fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      aligned.write.mode(SaveMode.Append).parquet(path)
    }

  /** S9: windowed delete-then-append upsert
    * (`ref/RCO_Overall_orchestrator.R:286-499`): per partition key,
    * delete stored rows with time >= min(incoming) − pad, then append
    * the incoming rows. Untouched keys' partitions are not rewritten. */
  def upsertWindow(spark: SparkSession, newDf: DataFrame, path: String,
      keyCol: String, timeCol: String, padSec: Double = 10.0): Unit = {
    if (!exists(spark, path)) {
      newDf.write.partitionBy(keyCol).mode(SaveMode.Append).parquet(path)
      return
    }
    val bounds = newDf.groupBy(col(keyCol))
      .agg((min(col(timeCol)) - padSec).as("__threshold"))
    // inner join keeps only touched keys; dynamic overwrite leaves the
    // other partitions alone.
    val keptOld = spark.read.parquet(path)
      .join(broadcast(bounds), Seq(keyCol))
      .filter(col(timeCol) < col("__threshold"))
      .drop("__threshold")
      .localCheckpoint(true)
    keptOld.unionByName(newDf.select(keptOld.columns.map(col): _*))
      .write.partitionBy(keyCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(path)
  }

  /** S10: full-replace-with-dedup
    * (`ref/RCO_Overall_orchestrator.R:556-585`): stored rows whose key
    * is not superseded by the incoming set survive (D3 anti-membership),
    * incoming rows win, table rewritten. */
  def replaceDedup(spark: SparkSession, newDf: DataFrame, path: String,
      keyCol: String): Unit = {
    if (!exists(spark, path)) {
      newDf.write.mode(SaveMode.Append).parquet(path)
      return
    }
    val kept = spark.read.parquet(path)
      .join(newDf.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .localCheckpoint(true)
    kept.unionByName(newDf.select(kept.columns.map(col): _*))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** S11: metadata upsert (`App/etl/overall_etl.py:186-232`,
    * `ref/RCO_Overall_orchestrator.R:236-281,502-546`): MERGE by key —
    * incoming rows update-or-insert, other keys' rows survive. */
  def upsertByKey(spark: SparkSession, newDf: DataFrame, path: String,
      keyCols: Seq[String]): Unit = {
    if (!exists(spark, path)) {
      newDf.write.mode(SaveMode.Append).parquet(path)
      return
    }
    val kept = spark.read.parquet(path)
      .join(newDf.select(keyCols.map(col): _*).distinct(), keyCols,
        "left_anti")
      .localCheckpoint(true)
    kept.unionByName(newDf.select(kept.columns.map(col): _*))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
