package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{LlmCorpus, LlmSim}

/** Golden tests for the corpus export/quality operators
  * (shuffle-shard assignment, unigram-LM scoring, duplicated-span
  * detection, int8 quantization audit) with independently computed
  * answers. */
class LlmCorpusSpec extends GraftSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shuffleShards matches an independent hash computation") {
    val docs = (0L until 40L).map(i => (i, s"tok$i text"))
      .toDF("doc_id", "text")
    val out = LlmCorpus.shuffleShards(docs, nShards = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("seq")))).toMap
    // independent single-threaded transcription of the contract
    val expected = (0L until 40L).map { i =>
      val h = md5hex(s"shard:$i")
      val shard = java.lang.Long.parseLong(h.substring(0, 4), 16) % 4
      (i, shard, h.substring(4))
    }
    val expMap = expected.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(t => (t._3, t._1)).zipWithIndex
        .map { case ((i, s, _), k) => i -> ((s, k + 1L)) }
    }
    assert(out == expMap)
    // every doc present exactly once; seq contiguous from 1 per shard
    assert(out.size == 40)
    out.values.groupBy(_._1).foreach { case (_, seqs) =>
      assert(seqs.map(_._2).toSeq.sorted == (1L to seqs.size).toSeq)
    }
  }

  test("shuffleShards emits token counts") {
    val docs = Seq((1L, "a b  c"), (2L, "")).toDF("doc_id", "text")
    val n = LlmCorpus.shuffleShards(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .toMap
    assert(n == Map(1L -> 3L, 2L -> 0L))
  }

  test("unigramLm hand-computed smoothed log-probs") {
    // counts: a=2 b=2 c=1; N=5, V=3 → p(a)=p(b)=3/8, p(c)=2/8
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = LlmCorpus.unigramLm(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
          r.getAs[Double]("ppl")))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // same op order as the operator: ln(c+1) - ln(N+V) per token
    val lpA = math.log(3.0) - math.log(8.0)
    val lpC = math.log(2.0) - math.log(8.0)
    val lp2 = (lpA + lpC) / 2
    assert(out(1L) == ((3L, r6(lpA), r6(math.exp(-lpA)))))
    assert(out(2L) == ((2L, r6(lp2), r6(math.exp(-lp2)))))
  }

  test("substrDup flags shared token spans regardless of offset") {
    // docs 1 and 2 share a verbatim 5-token span at DIFFERENT offsets;
    // doc 3 is unique. n = 4 → the shared span contributes 2 shared
    // 4-grams to each doc.
    val span = "v w x y z"
    val docs = Seq(
      (1L, s"$span p q r"),         // grams: 5 distinct 4-grams
      (2L, s"m $span n"),           // shifted by one token
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = LlmCorpus.substrDup(docs, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup")))).toMap
    // "v w x y" and "w x y z" are the only grams in both docs
    assert(out(1L) == ((5L, 2L)))
    assert(out(2L) == ((4L, 2L)))
    assert(out(3L) == ((3L, 0L)))
  }

  test("substrDup drops docs shorter than the gram length") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val ids = LlmCorpus.substrDup(docs, n = 4).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(2L))
  }

  test("embedQuant matches a single-threaded transcription") {
    val docs = Seq((1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = LlmSim.embedQuant(docs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dims"), r.getAs[Double]("scale"),
          r.getAs[Double]("rms_err")))).toMap
    // transcription of the contract in the operator's own op order
    val v = Seq(1.0f, -0.5f, 0.25f).map(_.toDouble)
    val s = v.map(math.abs).max / 127
    val errs = v.map(x => x - math.floor(x / s + 0.5) * s)
    val rms = math.sqrt(errs.foldLeft(0.0)((a, e) => a + e * e) / 3)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, r6(s), r6(rms))))
    assert(out(2L) == ((2L, 0.0, 0.0)), "zero vector quantizes exactly")
  }
}
