package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.ParquetSinks

/** Incremental corpus ingestion: near-dedup a NEW batch of documents
  * against a PERSISTED MinHash band index, then extend the index with
  * the accepted documents — the daily-crawl idiom (dedup today's crawl
  * against everything ever accepted) that a one-shot corpus dedup
  * ([[LlmText.dedupNear]]) cannot express.
  *
  * Index layout: one row per (band key, doc_id) carrying the full
  * MinHash signature, stored as a bucketed table hashed on the band
  * key. Both halves of the scale argument live on that key:
  *  - the batch→index probe reads ONLY the index buckets the batch's
  *    band keys hash into ([[ParquetSinks.readBucketsFor]]) — the scan
  *    is O(batch-touched buckets), not O(index);
  *  - the index append rewrites only those same buckets
  *    ([[ParquetSinks.upsertByKeyBucketed]] keyed on (key, doc_id), so
  *    re-ingesting a batch never duplicates index rows).
  *
  * Duplicate decision: band-key collision proposes a candidate pair
  * (the LSH screen, identical banding to [[LlmText.dedupNear]]);
  * the pair is CONFIRMED by MinHash signature agreement ≥
  * [[AgreeMin]] — the estimator E[agree/n] = J(a,b), evaluated from
  * the signatures both sides already carry, so the index never stores
  * shingle sets. Intra-batch near-dups are screened with the same
  * collision+agreement rule (keep = smaller doc_id); the screen is
  * greedy (a doc pairing only with an already-rejected doc is still
  * rejected), which is the standard one-pass ingest behavior.
  *
  * Re-ingesting the same batch is a no-op: each document's bands
  * collide with its OWN index rows, which the self-match filter
  * excludes; the accepted set is mutually non-duplicate under the same
  * measure, so it is accepted again and the keyed index merge changes
  * nothing (LlmIngestSpec asserts both).
  */
object LlmIngest {

  /** Minimum fraction of agreeing signature positions — the MinHash
    * estimate of [[LlmText.JaccardThreshold]]. */
  val AgreeMin: Double = LlmText.JaccardThreshold

  /** Band rows (key, doc_id, sig) of a batch: the [[LlmText]] banding
    * over the native shingle+minhash kernels, signature kept aboard. */
  private def bandRows(documents: DataFrame): DataFrame = {
    val sig = LlmText.shingles(documents)
      .select(col("doc_id"),
        call_function("graft_minhash", col("shingles"),
          lit(LlmText.NumHashes)).as("sig"))
    sig.select(col("doc_id"), col("sig"),
      explode(array((0 until LlmText.NumBands).map { b =>
        concat_ws("|", lit(b) +:
          (0 until LlmText.BandRows).map(r =>
            element_at(col("sig"), b * LlmText.BandRows + r + 1)): _*)
      }: _*)).as("key"))
  }

  /** Agreeing-position fraction of two equal-length signatures. */
  private def agree(a: String, b: String) =
    aggregate(zip_with(col(a), col(b), (x, y) =>
      when(x === y, 1).otherwise(0)), lit(0), _ + _)
      .cast("double") / LlmText.NumHashes

  /** Ingest `newDocs` against the index at `indexPath`: returns the
    * ACCEPTED documents (near-dups of the index or of a smaller-id
    * batch sibling dropped) after extending the index with them.
    * First call creates the index. */
  def ingestDedup(spark: SparkSession, newDocs: DataFrame,
      indexPath: String): DataFrame = {
    // Everything that reads the index runs inside one scope whose pins
    // are released before return; the frame handed back depends only on
    // `newDocs` and the checkpointed reject set, never on the index
    // files the append below swaps out — a caller may collect it at any
    // later time without racing the sink.
    val (rejected, release) = CacheScope.collect {
      val bands = CacheScope.pin(bandRows(newDocs))
      val indexExists = {
        val p = new org.apache.hadoop.fs.Path(indexPath)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
      }
      // batch → index candidates: bucket-pruned scan, equi-join on the
      // band key, self-matches excluded (re-ingest), agreement-confirmed
      val dupVsIndex =
        if (!indexExists) spark.emptyDataFrame.select(lit(0L).as("doc_id"))
          .limit(0)
        else ParquetSinks.readBucketsFor(spark, indexPath, "key", bands)
          .select(col("key"), col("doc_id").as("idx_id"),
            col("sig").as("idx_sig"))
          .join(bands, Seq("key"))
          .filter(col("doc_id") =!= col("idx_id"))
          .filter(agree("sig", "idx_sig") >= AgreeMin)
          .select(col("doc_id")).distinct()
      // intra-batch screen: same collision+agreement rule, keep smaller id
      val dupInBatch = bands.as("x")
        .join(bands.as("y"),
          col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .filter(agree("x.sig", "y.sig") >= AgreeMin)
        .select(col("y.doc_id").as("doc_id")).distinct()
      // eager localCheckpoint = the pre-append barrier AND the lineage
      // cut: the reject decision (batch-bounded, one id column) is
      // computed against the CURRENT index state and stored; nothing
      // downstream can re-scan the bucket files the append replaces.
      // (Blocks live on executors — on a cluster, losing one fails the
      // job instead of silently re-deciding against a mutated index.)
      val rejectedIds = dupVsIndex.unionByName(dupInBatch).distinct()
        .localCheckpoint(true)
      val acceptedBands = bands.join(rejectedIds,
        Seq("doc_id"), "left_anti")
        .select(col("key"), col("doc_id"), col("sig"))
      ParquetSinks.upsertByKeyBucketed(spark, acceptedBands, indexPath,
        Seq("key", "doc_id"), "key")
      rejectedIds
    }
    release()
    newDocs.join(rejected, Seq("doc_id"), "left_anti")
  }
}
