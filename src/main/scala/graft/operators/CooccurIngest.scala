package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.ParquetSinks

/** Incremental item co-occurrence — the streaming/ingest twin of
  * [[ClassicQueries.itemCooccur]]: (user, item) interactions arrive
  * in batches, and the maintained state always answers the SAME
  * query the batch operator computes over everything ingested so far
  * (per pair, distinct users holding both items; Jaccard over the
  * items' user sets; support floor), without ever re-scanning
  * history.
  *
  * The non-additive part of co-occurrence is that an arriving
  * (user, item) pairs with the user's STORED basket, not just the
  * batch: a pair (u, {a, b}) is counted exactly once — in the batch
  * where the SECOND of the two items lands. Per batch, increments
  * are derived from (batch, basket-before): new-new pairs within the
  * batch plus new×stored pairs against the bucket-pruned basket rows
  * of the batch's users. Everything stored is an additive keyed sum
  * after that, the [[graft.sinks.AggMaintain]] contract.
  *
  * State (all bucketed, touched-bucket reads and rewrites —
  * maintenance is O(batch + touched pairs), never O(history)):
  *  - `path/basket`  — (user_id, item) seen so far, bucketed by user;
  *  - `path/co`      — (pair_key, item_a, item_b, co) pair counts;
  *  - `path/items`   — (item, n_users) distinct-user counts.
  *
  * Exactly-once: each state table carries its own `_applied/<batch>`
  * marker, applied co → items → basket LAST — increments are a pure
  * function of (batch, basket-before), so a replay after a partial
  * apply recomputes identical increments and skips the marked steps.
  * The unmarked-but-written window is one batch, the same bound every
  * staged sink here documents.
  */
object CooccurIngest {

  private def basketPath(path: String) = s"$path/basket"
  private def coPath(path: String) = s"$path/co"
  private def itemsPath(path: String) = s"$path/items"

  private def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  private def applied(spark: SparkSession, table: String,
      batchId: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$table/_applied", batchId)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def markApplied(spark: SparkSession, table: String,
      batchId: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$table/_applied", batchId)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  private def step(spark: SparkSession, table: String, batchId: String)(
      f: => Unit): Unit =
    if (!applied(spark, table, batchId)) {
      f
      markApplied(spark, table, batchId)
    }

  /** Fold one batch of `(userCol, itemCol)` interactions into the
    * state at `path`. Duplicate interactions (within the batch or vs
    * the stored basket) are absorbed — co-occurrence is over DISTINCT
    * (user, item). */
  def ingest(spark: SparkSession, batch: DataFrame, path: String,
      userCol: String, itemCol: String, batchId: String): Unit = {
    import spark.implicits._
    val basket = basketPath(path)
    val co = coPath(path)
    val items = itemsPath(path)
    // basket is marked LAST: its marker means the whole batch landed
    if (applied(spark, basket, batchId)) return

    val ui = batch
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).cast("long").as("user_id"),
        col(itemCol).cast("long").as("item"))
      .distinct()

    val ((newUI, coInc, itemInc), release) = CacheScope.collect {
      val storedForUsers = CacheScope.pin(
        if (!exists(spark, basket))
          Seq.empty[(Long, Long)].toDF("user_id", "item")
        else ParquetSinks
          .readBucketsFor(spark, basket, "user_id",
            ui.select(col("user_id")))
          .join(ui.select(col("user_id")).distinct(), Seq("user_id"),
            "left_semi")
          .select(col("user_id"), col("item")))
      val newUI = CacheScope.pin(
        ui.join(storedForUsers, Seq("user_id", "item"), "left_anti"))
      // new-new (a < b within the batch) ∪ new-stored (canonical
      // order) — disjoint by construction, so a per-user pair is
      // counted exactly once across the whole stream
      val nn = newUI.select(col("user_id"), col("item").as("item_a"))
        .join(newUI.select(col("user_id"), col("item").as("item_b")),
          Seq("user_id"))
        .filter(col("item_a") < col("item_b"))
        .select(col("item_a"), col("item_b"))
      val ns = newUI.select(col("user_id"), col("item").as("n_item"))
        .join(storedForUsers.select(col("user_id"),
          col("item").as("s_item")), Seq("user_id"))
        .select(least(col("n_item"), col("s_item")).as("item_a"),
          greatest(col("n_item"), col("s_item")).as("item_b"))
      val coInc = CacheScope.pin(nn.unionByName(ns)
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("inc"))
        .withColumn("pair_key",
          concat_ws("_", col("item_a"), col("item_b"))))
      val itemInc = CacheScope.pin(
        newUI.groupBy(col("item")).agg(count(lit(1)).as("inc")))
      (newUI, coInc, itemInc)
    }

    step(spark, co, batchId) {
      val stored =
        if (!exists(spark, co))
          Seq.empty[(String, Long, Long, Long)]
            .toDF("pair_key", "item_a", "item_b", "co")
        else ParquetSinks
          .readBucketsFor(spark, co, "pair_key",
            coInc.select(col("pair_key")))
          .join(coInc.select(col("pair_key")).distinct(),
            Seq("pair_key"), "left_semi")
          .select(col("pair_key"), col("item_a"), col("item_b"),
            col("co"))
      val merged = stored
        .unionByName(coInc.select(col("pair_key"), col("item_a"),
          col("item_b"), col("inc").as("co")))
        .groupBy(col("pair_key"), col("item_a"), col("item_b"))
        .agg(sum(col("co")).as("co"))
      ParquetSinks.upsertByKeyBucketed(spark, merged, co,
        Seq("pair_key"), "pair_key")
    }
    step(spark, items, batchId) {
      val stored =
        if (!exists(spark, items))
          Seq.empty[(Long, Long)].toDF("item", "n_users")
        else ParquetSinks
          .readBucketsFor(spark, items, "item",
            itemInc.select(col("item")))
          .join(itemInc.select(col("item")).distinct(), Seq("item"),
            "left_semi")
          .select(col("item"), col("n_users"))
      val merged = stored
        .unionByName(itemInc.select(col("item"),
          col("inc").as("n_users")))
        .groupBy(col("item")).agg(sum(col("n_users")).as("n_users"))
      ParquetSinks.upsertByKeyBucketed(spark, merged, items,
        Seq("item"), "item")
    }
    step(spark, basket, batchId) {
      if (!newUI.isEmpty)
        ParquetSinks.upsertByKeyBucketed(spark, newUI, basket,
          Seq("user_id", "item"), "user_id")
    }
    release()
  }

  /** The live answer — same columns, floor, and rounding as
    * [[ClassicQueries.itemCooccur]], served off the maintained state
    * (empty frame before any ingest). */
  def view(spark: SparkSession, path: String,
      minCo: Long = ClassicQueries.CooccurMin.toLong): DataFrame = {
    import spark.implicits._
    if (!exists(spark, coPath(path)))
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("item_a", "item_b", "co", "jaccard")
    val co = spark.read.parquet(coPath(path))
      .filter(col("co") >= minCo)
      .select(col("item_a"), col("item_b"), col("co"))
    val n = spark.read.parquet(itemsPath(path))
      .select(col("item"), col("n_users"))
    co.join(n.select(col("item").as("item_a"), col("n_users").as("na")),
        Seq("item_a"))
      .join(n.select(col("item").as("item_b"), col("n_users").as("nb")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("co"),
        round(col("co") / (col("na") + col("nb") - col("co")), 4)
          .as("jaccard"))
      .orderBy(col("item_a"), col("item_b"))
  }
}
