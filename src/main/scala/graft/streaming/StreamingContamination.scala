package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming eval-set decontamination — the streaming twin of
  * [[graft.operators.LlmPrep.contamination]], in the shape a corpus
  * INGEST pipeline actually runs it: the eval set is fixed and small
  * (its gram index is a STATIC frame, broadcast-joinable), while train
  * documents arrive as a stream and each micro-batch's docs are
  * checked against the index the moment they land.
  *
  * Per micro-batch: explode the incoming docs into distinct n-grams,
  * stream-static equi-join against the eval posting index on the gram,
  * count shared grams per (eval_id, train_id). The aggregate needs no
  * cross-batch state reconciliation: a document's grams all travel in
  * its own row, so every (eval_id, train_id) group is complete within
  * the batch that carries the train doc — the streaming aggregation
  * state exists only for update-mode bookkeeping and each pair is
  * final the first time it is emitted.
  *
  * The batch operator's TRAIN-side df cap has no streaming equivalent
  * (document frequency over an unbounded stream is unknowable at join
  * time) and is not needed for boundedness here: per-gram join fan-out
  * is capped by the eval set's df, which is small by construction.
  * Parity with the batch operator therefore holds at dfCap = ∞
  * (StreamingContaminationSpec asserts it); a production deployment
  * wanting boilerplate suppression would pre-filter the eval index by
  * its OWN df instead.
  */
object StreamingContamination {

  /** Static eval-set gram index: (gram, eval_id) postings of the
    * documents with doc_id ≡ 0 (mod evalMod) — distinct n-grams, same
    * construction as the batch operator's eval side. */
  def evalIndex(evalDocs: DataFrame, n: Int = graft.operators.LlmPrep.ContamN)
      : DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    evalDocs
      .select(col("doc_id").as("eval_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("eval_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k =>
            element_at(col("toks"), i + k)): _*)))).as("gram"))
  }

  /** @param trainDocs streaming (doc_id, text) train documents
    * @param index     static eval posting index from [[evalIndex]]
    * @param minShared report pairs sharing at least this many grams
    * @return streaming (eval_id, train_id, n_shared) in update mode */
  def apply(trainDocs: DataFrame, index: DataFrame,
      n: Int = graft.operators.LlmPrep.ContamN,
      minShared: Int = graft.operators.LlmPrep.ContamMinShared)
      : DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val posting = trainDocs
      .select(col("doc_id").as("train_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("train_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k =>
            element_at(col("toks"), i + k)): _*)))).as("gram"))
    posting
      .join(index, Seq("gram")) // stream-static inner join
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
