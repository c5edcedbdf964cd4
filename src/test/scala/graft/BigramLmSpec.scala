package graft

import graft.operators.LlmCorpus

/** [[LlmCorpus.bigramLm]]: hand-computed smoothing, the order
  * sensitivity unigrams lack, and the short-doc drop rule. */
class BigramLmSpec extends GraftSuite {
  import spark.implicits._

  private def run(texts: Seq[String]): Map[Long, (Long, Double, Double)] =
    LlmCorpus.bigramLm(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("hand-computed add-one smoothing") {
    // corpus "a b" x2: uni a=2 b=2, V=2; bigram (a,b)=2
    // logp = ln(3) - ln(4) per pair
    val out = run(Seq("a b", "a b"))
    val lp = math.log(3.0) - math.log(4.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) == ((1L, r6(lp), r6(math.exp(-lp)))))
    assert(out(0L) == out(1L))
  }

  test("implausible word order scores worse than the dominant order") {
    // "a b" dominates the corpus; one doc reverses it
    val texts = Seq.fill(9)("a b") :+ "b a"
    val out = run(texts)
    assert(out(9L)._3 > out(0L)._3,
      "reversed-order doc must have higher bigram perplexity")
    // a unigram model cannot tell them apart (same bag of words)
    val uni = LlmCorpus.unigramLm(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(uni(9L) == uni(0L))
  }

  test("docs with fewer than two tokens drop") {
    val out = run(Seq("solo", "", "two tokens"))
    assert(out.keySet == Set(2L))
  }
}
