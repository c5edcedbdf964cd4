package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.LlmPrep
import graft.streaming.StreamingContamination

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class ContamDoc(doc_id: Long, text: String)

/** Stream-static decontamination parity with the batch operator. */
class StreamingContaminationSpec extends GraftSuite {
  import spark.implicits._

  private type Doc = ContamDoc
  private def Doc(id: Long, text: String) = ContamDoc(id, text)

  private val docs = Seq(
    Doc(0L, "alpha beta gamma delta epsilon zeta"), // eval (id % 4 == 0)
    Doc(1L, "alpha beta gamma delta epsilon zeta"), // = doc 0
    Doc(2L, "one two three four five six"),
    Doc(3L, "alpha beta gamma delta other tail"),
    Doc(4L, "one two three four five six seven"), // eval, = doc 2 prefix
    Doc(5L, "unrelated text entirely here now yes"))

  test("streaming pairs equal the batch operator (uncapped df)") {
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = docs.filter(_.doc_id % 4 == 0)
    val trainDocs = docs.filter(_.doc_id % 4 != 0)
    val index = StreamingContamination.evalIndex(
      evalDocs.toDF(), n = 3)
    val input = MemoryStream[ContamDoc]
    val query = StreamingContamination(input.toDF(), index,
      n = 3, minShared = 1)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode(OutputMode.Update).start()
    try {
      // split the train stream across micro-batches: per-pair counts
      // must still be complete (each doc's grams travel together)
      input.addData(trainDocs.take(1): _*)
      query.processAllAvailable()
      input.addData(trainDocs.drop(1): _*)
      query.processAllAvailable()
      val got = spark.table("contam_out")
        .groupBy($"eval_id", $"train_id")
        // update mode re-emits a group only if it changed; take the max
        // so a (theoretical) multi-emission never double-counts
        .agg(org.apache.spark.sql.functions.max($"n_shared").as("n_shared"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = LlmPrep.contamination(docs.toDF(),
        evalMod = 4, n = 3, dfCap = Int.MaxValue, minShared = 1)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(expected.nonEmpty, "fixture sanity: some contamination")
      assert(got == expected)
    } finally query.stop()
  }
}
