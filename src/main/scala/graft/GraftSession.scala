package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config every graft main/test shares —
  * extension install, UTC, ns-parquet read compat, and the local-mode
  * performance hygiene that keeps measurements about PLANS:
  *
  *  - [[graft.hadoop.NioLocalFileSystem]] as the `file://`
  *    implementation: the stock one fork+execs `chmod`/`stat` child
  *    processes per file when libhadoop is absent (see its scaladoc for
  *    the measured pathology);
  *  - file-committer algorithm v2: v1 renames every partition dir
  *    sequentially on the driver at job commit (~1,500 `LINE=` dirs per
  *    e2e table).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int)
      : SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.install)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.hadoop.NioLocalFileSystem].getName)
      // The compiled-codegen cache holds 100 classes by default; one
      // multi-table pipeline run (7 output tables × multi-stage plans +
      // upsert read-backs) generates several times that, so every run
      // re-janino-compiles and re-JITs the SAME generated sources
      // forever — measured 50-150 CPU-s of JIT churn per e2e rep, paid
      // inside executor task threads. Size the cache to hold every
      // plan of a full pipeline+bench session (entries are compiled
      // classes: ~10-100 KB each, bounded memory).
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")

  /** Builder sized from the driver-provided env (bench/verify mains). */
  def builderFromEnv(): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    builder(s"local[$cpus]", cpus.toInt)
  }
}
