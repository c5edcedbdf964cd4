package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016, the
  * tokenizer-training step of every LLM data pipeline), distributed:
  *
  *  1. ONE corpus scan folds the documents into the distinct-WORD
  *     frequency table (the classic trainer's dictionary) — all later
  *     work is vocabulary-sized, never corpus-sized. Each word starts
  *     as its character symbols plus a terminal `</w>` marker.
  *  2. Per merge round: count adjacent symbol pairs weighted by word
  *     frequency (map-side-combined aggregate), take the argmax —
  *     deterministic by (count DESC, left ASC, right ASC) — as a
  *     ONE-ROW driver collect (bounded: one row per round, the same
  *     sanctioned scalar-probe shape as ProdOps.roundAdaptive), then
  *     rewrite every word's symbol array with a greedy left-to-right
  *     non-overlapping fold of that single pair (a codegen'd
  *     `aggregate` lambda — no UDF).
  *  3. Lineage is cut with `localCheckpoint` each round so R rounds
  *     cost R shallow plans instead of one R-deep nested-lambda plan
  *     (measured: the nested plan's analysis time grows superlinearly
  *     past ~10 rounds).
  *
  * The number of merges R is a model hyperparameter (30k-100k in
  * production), independent of corpus size: the driver loop is
  * R-bounded by construction. At 100 TB the word table is the only
  * large frame; it shrinks as merges fuse symbols and is re-persisted
  * per round.
  *
  * The gate oracle unrolls the fixed merge count into chained
  * MATERIALIZED CTE rounds ([[BpeTrainSql]] — the per-round argmax is
  * deterministic by (n DESC, left, right) so cross-engine order is
  * pinned); exact parity is additionally pinned in-suite against a
  * single-threaded reference trainer (BpeTrainSpec).
  *
  * Cite: generic LLM-pipeline capability (mandate §multimodal/text;
  * no counterpart in the reference ETL).
  */
object BpeTrain {

  /** End-of-word marker symbol (separate final symbol, Sennrich-style,
    * so merges can distinguish word-final from word-internal pairs). */
  val EndOfWord = "</w>"

  /** Initial symbol array of a word: its characters plus [[EndOfWord]]. */
  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Greedy left-to-right non-overlapping merge of the adjacent pair
    * (l, r) inside a symbol array — the state of the fold is
    * (rewritten prefix, pending symbol); a merge consumes the pending
    * symbol so the merged token never re-pairs within the same round
    * (standard BPE round semantics: "aaaa" + (a,a) -> "aa","aa"). */
  private[graft] def mergePair(syms: Column, l: String, r: String): Column = {
    val merged = l + r
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    aggregate(
      syms,
      init,
      (acc, s) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        when(prev.isNull, struct(out.as("out"), s.as("prev")))
          .when(prev === lit(l) && s === lit(r),
            struct(concat(out, array(lit(merged))).as("out"),
              lit(null).cast("string").as("prev")))
          .otherwise(struct(concat(out, array(prev)).as("out"),
            s.as("prev")))
      },
      acc => when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("prev")))))
  }

  /** Adjacent-pair frequency table of a word frame
    * `(syms: array<string>, freq: long)` — overlapping occurrences all
    * count (Sennrich's zip(s, s[1:]) convention). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(when(size(col("syms")) >= 2,
        transform(sequence(lit(1), (size(col("syms")) - 1).cast("int")),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("freq")).as("n"))

  /** Train `merges` BPE merge rules over the corpus. Returns the merge
    * table `(rank, left, right, merged, n)` in learned order — fewer
    * than `merges` rows when no pair reaches `minCount` (training is
    * exhausted). */
  def train(documents: DataFrame, textCol: String = "text",
      merges: Int = 12, minCount: Long = 2L): DataFrame = {
    require(merges >= 1, s"bpeTrain: merges must be >= 1, got $merges")
    require(minCount >= 1, s"bpeTrain: minCount must be >= 1, got $minCount")
    val spark = documents.sparkSession

    var words = documents
      .select(explode(call_function("graft_tokens", col(textCol)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint(true)

    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    var rank = 0
    while (rank < merges && !exhausted) {
      val top = pairCounts(words)
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top(0)
        val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
        learned += ((rank, l, r, l + r, n))
        val next = words
          .select(mergePair(col("syms"), l, r).as("syms"), col("freq"))
          .localCheckpoint(true)
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    toMergeFrame(spark, learned.toSeq)
  }

  /** Apply a learned merge table to the corpus: every document becomes
    * its BPE piece sequence `(doc_id, word_pos, piece_pos, piece)`
    * (1-based positions, word order = token order).
    *
    * The merges are applied IN RANK ORDER to the distinct-word table
    * (same vocabulary-sized frame as training — the corpus is touched
    * exactly twice: once to build the word list, once to join the
    * encoded pieces back), each rule via the same greedy
    * [[mergePair]] fold, with lineage cut every few rules. R rules
    * cost R vocabulary-sized stages — the training cost profile; a
    * production 30k-rule apply wants the pieces joined from a
    * persisted word→pieces table refreshed only when the tokenizer
    * changes, which is exactly what this produces. */
  def encode(documents: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    var words = documents
      .select(explode(call_function("graft_tokens", col(textCol)))
        .as("word"))
      .distinct()
      .select(col("word"), initialSymbols(col("word")).as("syms"))
      .localCheckpoint(true)
    // `pinned` tracks the last CHECKPOINTED frame: on a checkpoint
    // round `words` is the lazy frame built since the previous cut, so
    // unpersisting it would be a no-op and the old checkpoint's blocks
    // would leak for the length of the merge list (ADVICE r12).
    var pinned = words
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      val next0 = words.select(col("word"),
        mergePair(col("syms"), l, r).as("syms"))
      if ((i + 1) % 6 == 0 || i == merges.size - 1) {
        val next = next0.localCheckpoint(true)
        pinned.unpersist()
        pinned = next
        words = next
      } else words = next0
    }
    documents
      .select(col(idCol),
        posexplode(call_function("graft_tokens", col(textCol))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("word_pos"),
        col("col").as("word"))
      .join(words, Seq("word"))
      .select(col(idCol), col("word_pos"),
        posexplode(col("syms")))
      .select(col(idCol), col("word_pos"),
        (col("pos") + 1).cast("long").as("piece_pos"),
        col("col").as("piece"))
  }

  private[graft] def toMergeFrame(spark: SparkSession,
      rows: Seq[(Int, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("rank", "left", "right", "merged", "n")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("merged"), col("n"))
  }
}
