package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.LlmCorpus
import graft.streaming.StreamingUnigram

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class UgDoc(doc_id: Long, text: String)

/** Stream-static unigram-LM scoring parity with the batch operator. */
class StreamingUnigramSpec extends GraftSuite {
  import spark.implicits._

  private def collectScores(
      got: scala.collection.mutable.Map[Long, (Long, Double, Double)])
      (scores: org.apache.spark.sql.DataFrame): Unit =
    scores.collect().foreach(r =>
      got(r.getAs[Long]("doc_id")) =
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
          r.getAs[Double]("ppl"))))

  test("streamed self-corpus scoring equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val vocabWords = Vector("a", "b", "c", "dd", "ee")
    val corpus = (0L until 14L).map(id => UgDoc(id,
      Seq.fill(1 + rnd.nextInt(8))(vocabWords(rnd.nextInt(5)))
        .mkString(" ")))
    val (cnt, stats) = StreamingUnigram.lmIndex(corpus.toDF())
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Double, Double)]
    val input = MemoryStream[UgDoc]
    val query = StreamingUnigram.start(input.toDF(), cnt, stats,
      emit = collectScores(got))
    try {
      // random batch boundaries: per-doc scores are batch-local, so
      // parity must not depend on how the stream is chopped
      var rest = corpus
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        input.addData(rest.take(take): _*)
        query.processAllAvailable()
        rest = rest.drop(take)
      }
      val expected = LlmCorpus.unigramLm(corpus.toDF()).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
            r.getAs[Double]("ppl")))).toMap
      assert(expected.nonEmpty, "fixture sanity")
      assert(got.toMap == expected,
        "scoring the training corpus itself must equal batch unigramLm")
    } finally query.stop()
  }

  test("out-of-vocabulary tokens score as unseen, not dropped") {
    implicit val sqlCtx = spark.sqlContext
    // LM trained on a+b only; the streamed doc is pure OOV
    val ref = Seq(UgDoc(1L, "a a b")).toDF()
    val (cnt, stats) = StreamingUnigram.lmIndex(ref)
    val got = scala.collection.mutable.Map
      .empty[Long, (Long, Double, Double)]
    val input = MemoryStream[UgDoc]
    val query = StreamingUnigram.start(input.toDF(), cnt, stats,
      emit = collectScores(got))
    try {
      input.addData(UgDoc(100L, "zz yy zz"))
      query.processAllAvailable()
      // counts: a=2 b=1 → N=3, V=2; OOV logp = ln(1) - ln(5)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val lp = math.log(1.0) - math.log(5.0)
      assert(got(100L) == ((3L, r6(lp), r6(math.exp(-lp)))),
        "every OOV token present with the smoothed unseen score")
    } finally query.stop()
  }
}
