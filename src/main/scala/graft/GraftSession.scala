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
      // NOTE on AQE initialPartitionNum (tried in round 17, measured,
      // REVERTED — keep it out): raising the initial exchange width
      // above spark.sql.shuffle.partitions makes every join
      // requirement ask for the raised width, which no explicitly
      // pre-partitioned PINNED frame matches (PageRank pins edges at
      // min(scan width, shuffle partitions) by design) — so the
      // engine re-exchanges cached edges/nodes EVERY iteration,
      // exactly the per-round shuffle the pin contract exists to
      // prevent (PageRankSpec's plan-shape test caught it). It also
      // bought nothing measurable for the one stage it was aimed at
      // (dedupNgram candidates: 176 → 161 s at the 100× probe rung,
      // inside host noise). Deployment-scale partition sizing belongs
      // in spark.sql.shuffle.partitions itself, which every pinned
      // repartition in this codebase follows by construction.
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
