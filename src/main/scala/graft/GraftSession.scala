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
      .config(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")

  /** Builder sized from the driver-provided env (bench/verify mains). */
  def builderFromEnv(): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    builder(s"local[$cpus]", cpus.toInt)
  }
}
