package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.LlmPrep
import graft.streaming.StreamingContamination

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class ContamDoc(doc_id: Long, text: String)

/** Stream-static decontamination parity with the batch operator. */
class StreamingContaminationSpec extends GraftSuite {
  import spark.implicits._

  private val docs = Seq(
    ContamDoc(0L, "alpha beta gamma delta epsilon zeta"), // eval (id%4==0)
    ContamDoc(1L, "alpha beta gamma delta epsilon zeta"), // = doc 0
    ContamDoc(2L, "one two three four five six"),
    ContamDoc(3L, "alpha beta gamma delta other tail"),
    ContamDoc(4L, "one two three four five six seven"), // eval, ⊃ doc 2
    ContamDoc(5L, "unrelated text entirely here now yes"))

  test("streamed batches equal the batch operator (uncapped df)") {
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = docs.filter(_.doc_id % 4 == 0)
    val trainDocs = docs.filter(_.doc_id % 4 != 0)
    val index = StreamingContamination.evalIndex(evalDocs.toDF(), n = 3)
    val got = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val input = MemoryStream[ContamDoc]
    // stateless ingest: each micro-batch runs the per-batch kernel and
    // emits final pairs — nothing accumulates in streaming state
    val query = StreamingContamination.start(input.toDF(), index,
      emit = pairs => pairs.collect().foreach(r =>
        got((r.getLong(0), r.getLong(1))) = r.getLong(2)),
      n = 3, minShared = 1)
    try {
      // split the train stream across micro-batches: per-pair counts
      // must still be complete (each doc's grams travel together)
      input.addData(trainDocs.take(1): _*)
      query.processAllAvailable()
      input.addData(trainDocs.drop(1): _*)
      query.processAllAvailable()
      val expected = LlmPrep.contamination(docs.toDF(),
        evalMod = 4, n = 3, dfCap = Int.MaxValue, minShared = 1)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(expected.nonEmpty, "fixture sanity: some contamination")
      assert(got.toMap == expected)
    } finally query.stop()
  }

  test("parity holds on random corpora and random batch splits") {
    implicit val sqlCtx = spark.sqlContext
    for (i <- 0 until 5) {
      val rnd = new scala.util.Random(7000 + i)
      val vocabWords = Vector("a", "b", "c", "dd")
      val corpus = (0L until 16L).map(id => ContamDoc(id,
        Seq.fill(rnd.nextInt(10))(vocabWords(rnd.nextInt(4)))
          .mkString(" ")))
      val index = StreamingContamination.evalIndex(
        corpus.filter(_.doc_id % 4 == 0).toDF(), n = 2)
      val train = corpus.filter(_.doc_id % 4 != 0)
      val got = scala.collection.mutable.Map.empty[(Long, Long), Long]
      val input = MemoryStream[ContamDoc]
      val query = StreamingContamination.start(input.toDF(), index,
        emit = pairs => pairs.collect().foreach(r =>
          got((r.getLong(0), r.getLong(1))) = r.getLong(2)),
        n = 2, minShared = 1)
      try {
        // random batch boundaries: parity must not depend on how the
        // stream is chopped
        var rest = train
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(rest.size)
          input.addData(rest.take(take): _*)
          query.processAllAvailable()
          rest = rest.drop(take)
        }
        val expected = LlmPrep.contamination(corpus.toDF(),
          evalMod = 4, n = 2, dfCap = Int.MaxValue, minShared = 1)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got.toMap == expected, s"seed=${7000 + i}")
      } finally query.stop()
    }
  }
}
