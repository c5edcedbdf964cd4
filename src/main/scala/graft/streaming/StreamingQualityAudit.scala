package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.QualityChecks
import graft.sinks.AggMaintain

/** Continuous data-quality monitor — the streaming twin of
  * [[QualityChecks]]: every arriving micro-batch contributes its own
  * violation counters, and the whole-history report (same schema as
  * `QualityChecks.audit` + `report`) is one read-and-merge away. Two
  * kinds of state, each with the round-proven idempotence discipline:
  *
  *  - ROW checks (not_null / in_range / accepted_values) and
  *    referential integrity against a PINNED dimension snapshot are
  *    additive counters: each batch's fused one-pass audit lands as a
  *    shard at `dir/batch_id=N` with dynamic partition overwrite
  *    (redelivery REPLACES the shard — the [[StreamingProfile]]
  *    layout), and the report sums shards.
  *  - UNIQUE is the one non-additive check (cross-batch duplicates
  *    are invisible to per-batch counters), so it is maintained
  *    exactly as a per-key count table via [[AggMaintain]] (bucket-
  *    pruned O(batch) folds, `_applied` replay ledger):
  *    violations = Σ key counts − distinct keys, computed from the
  *    state at read time.
  *
  * At 100 TB/day this is the quality dashboard a crawl/ETL pipeline
  * publishes next to the data: per-batch shards stay KB-sized, the
  * unique-key state is the only O(distinct keys) frame and rides the
  * bucketed sink built for exactly that shape.
  */
object StreamingQualityAudit {

  /** Separator for composing a multi-column unique key into
    * AggMaintain's single key column. Rows whose key columns contain
    * it would alias — pick keys free of control chars (contract). */
  val KeySep = "\u0001"

  private[graft] def uniqueStateDir(dir: String) = s"$dir/_unique_state"

  /** Start auditing `df`. `checks` must not contain
    * [[QualityChecks.Unique]] — pass `uniqueKey` instead so the
    * monitor tracks duplicates exactly across batches. Each
    * `refs` entry `(fk, parentSnapshot, parentTable, pk)` audits
    * referential integrity against a dimension pinned at start time
    * (the [[StreamingAsOf]] static-snapshot convention). */
  def start(df: DataFrame, dir: String, tableName: String,
      checks: Seq[QualityChecks.Check],
      uniqueKey: Seq[String] = Nil,
      refs: Seq[(String, DataFrame, String, String)] = Nil,
      checkpoint: Option[String] = None): StreamingQuery = {
    require(checks.forall(!_.isInstanceOf[QualityChecks.Unique]),
      "StreamingQualityAudit: Unique is not batch-additive — pass " +
        "uniqueKey so duplicates are tracked exactly across batches")
    // same ledger namespacing rule as StreamingAggMaintain: bare epoch
    // with a checkpoint (stable across restarts), fresh run salt
    // without one (restart renumbering must not collide)
    val ns = checkpoint match {
      case Some(_) => "epoch"
      case None => "run" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(12)
    }
    val w = df.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          writeShard(batch, dir, tableName, checks, refs, epochId)
          if (uniqueKey.nonEmpty)
            maintainUnique(batch, dir, uniqueKey, s"${ns}_$epochId")
        }
      }
      .start()
  }

  /** One batch's additive counter shard (exposed for the spec's
    * redelivery case). `passed` is derived at read time — a per-batch
    * boolean would not merge. */
  def writeShard(batch: DataFrame, dir: String, tableName: String,
      checks: Seq[QualityChecks.Check],
      refs: Seq[(String, DataFrame, String, String)],
      batchId: Long): Unit = {
    val rowPart =
      if (checks.isEmpty) Nil
      else Seq(QualityChecks.audit(batch, tableName, checks)
        .drop("passed"))
    val riPart = refs.map { case (fk, parent, pt, pk) =>
      QualityChecks.refIntegrity(batch, tableName, fk, parent, pt, pk)
        .drop("passed")
    }
    // hidden row carrying the batch's row count: the unique check's
    // report row needs the TABLE total, which no additive check row
    // carries when its own total is defined over a filtered domain
    val totalRow = batch.agg(count(lit(1)).as("__n"))
      .select(lit(tableName).as("table_name"),
        lit("__total").as("check"), lit("*").as("target"),
        lit(0L).as("violations"), col("__n").cast("long").as("total"))
    (rowPart ++ riPart :+ totalRow).reduce(_ unionByName _)
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)
  }

  /** Fold one batch's unique-key observations into the maintained
    * per-key count state (exposed for the spec's replay case). Rows
    * with any NULL key component are excluded — identical domain to
    * the batch [[QualityChecks.Unique]] check. */
  def maintainUnique(batch: DataFrame, dir: String,
      uniqueKey: Seq[String], ledgerId: String): Unit = {
    val keyed = batch
      .filter(uniqueKey.map(col(_).isNotNull).reduce(_ && _))
      .select(concat_ws(KeySep, uniqueKey.map(col): _*).as("__uq_key"),
        lit(1.0).as("__uq_one"))
    AggMaintain.maintain(batch.sparkSession, keyed, uniqueStateDir(dir),
      "__uq_key", "__uq_one", ledgerId)
  }

  /** The whole-history report, same schema and order as the batch
    * [[QualityChecks.report]]. Pass the `uniqueKey` given to `start`
    * so the unique row is labeled identically to the batch twin. */
  def currentReport(spark: SparkSession, dir: String,
      uniqueKey: Seq[String] = Nil): DataFrame = {
    val summed = spark.read.parquet(dir).drop("batch_id")
      .groupBy(col("table_name"), col("check"), col("target"))
      .agg(sum(col("violations")).as("violations"),
        sum(col("total")).as("total"))
    val totals = summed.filter(col("check") === "__total")
      .select(col("table_name"), col("total"))
    val rows = summed.filter(col("check") =!= "__total")
    val withUnique =
      if (uniqueKey.isEmpty) rows
      else {
        val st = spark.read.parquet(uniqueStateDir(dir))
        val uq = st.agg(
            (sum(col("agg_cnt")) - count(lit(1))).cast("long")
              .as("violations"))
          .crossJoin(broadcast(totals))
          .select(col("table_name"), lit("unique").as("check"),
            lit(uniqueKey.mkString(",")).as("target"),
            col("violations"), col("total"))
        rows.unionByName(uq)
      }
    withUnique
      .withColumn("passed", col("violations") === lit(0))
      .orderBy(col("table_name"), col("check"), col("target"))
  }
}
