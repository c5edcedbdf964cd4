package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.LlmCorpus

/** Differential tests: each LlmCorpus operator vs an independent
  * single-threaded Scala computation on random (fixed-seed) corpora
  * drawn from a TINY vocabulary so span collisions and shared grams
  * occur often. */
class LlmCorpusPropertySpec extends GraftSuite {

  private val vocab = Vector("a", "b", "c", "dd", "ee")

  private val genDoc: Gen[String] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private val genCorpus: Gen[Seq[(Long, String)]] =
    Gen.choose(6, 24).flatMap(n =>
      Gen.listOfN(n, genDoc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def grams(t: String, n: Int): Set[String] = {
    val ts = toks(t)
    if (ts.size < n) Set.empty
    else ts.sliding(n).map(_.mkString(" ")).toSet
  }

  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "10").toInt

  private def corpus(i: Int): Seq[(Long, String)] =
    genCorpus(Gen.Parameters.default, Seed(7000L + i)).get

  test("substrDup matches brute-force span document frequencies") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      val n = 2
      val g = docs.map { case (id, t) => id -> grams(t, n) }
        .filter(_._2.nonEmpty).toMap
      val df = g.values.flatten.groupBy(identity)
        .map { case (k, v) => k -> v.size }
      val expected = g.map { case (id, gs) =>
        id -> ((gs.size.toLong, gs.count(df(_) >= 2).toLong))
      }
      val got = LlmCorpus.substrDup(docs.toDF("doc_id", "text"), n = n)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup")))).toMap
      assert(got == expected, s"seed=${7000 + i} docs=$docs")
    }
  }

  test("unigramLm matches brute-force smoothed scoring") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      val all = docs.flatMap { case (_, t) => toks(t) }
      if (all.nonEmpty) {
        val cnt = all.groupBy(identity).map { case (k, v) => k -> v.size }
        val n = all.size
        val v = cnt.size
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val expected = docs
          .map { case (id, t) => id -> toks(t) }
          .filter(_._2.nonEmpty)
          .map { case (id, ts) =>
            val lps = ts.map(tk =>
              math.log(cnt(tk) + 1.0) - math.log(n.toDouble + v))
            val avg = lps.sum / lps.size
            id -> ((ts.size.toLong, r6(avg), r6(math.exp(-avg))))
          }.toMap
      val got = LlmCorpus.unigramLm(docs.toDF("doc_id", "text"))
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
              r.getAs[Double]("ppl")))).toMap
        // avg over doubles: engine sum order may differ from ours →
        // compare at 1e-9, the same slack the oracle's fallback uses
        assert(got.keySet == expected.keySet, s"seed=${7000 + i}")
        got.foreach { case (id, (nt, lp, ppl)) =>
          val (ent, elp, eppl) = expected(id)
          assert(nt == ent, s"seed=${7000 + i} id=$id")
          assert(math.abs(lp - elp) < 1e-9, s"seed=${7000 + i} id=$id")
          assert(math.abs(ppl - eppl) < 1e-9, s"seed=${7000 + i} id=$id")
        }
      }
    }
  }

  test("qualityClf matches brute-force naive-Bayes on random corpora") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      // random trusted/untrusted source assignment; re-roll degenerate
      // one-class draws (the operator's documented precondition)
      val docs = corpus(i).map { case (id, t) =>
        (id, t, if ((id + i) % 3 == 0) "tr" else "un")
      }
      val classes = docs.map(_._3).toSet
      if (classes == Set("tr", "un")) {
        val cPos = docs.filter(_._3 == "tr").flatMap(d => toks(d._2))
          .groupBy(identity).map { case (k, v) => k -> v.size }
        val cNeg = docs.filter(_._3 == "un").flatMap(d => toks(d._2))
          .groupBy(identity).map { case (k, v) => k -> v.size }
        val v = (cPos.keySet ++ cNeg.keySet).size.toDouble
        val (nPos, nNeg) = (cPos.values.sum, cNeg.values.sum)
        val prior = math.log(docs.count(_._3 == "tr").toDouble) -
          math.log(docs.count(_._3 == "un").toDouble)
        val expected = docs.map { case (id, t, _) => id -> toks(t) }
          .filter(_._2.nonEmpty)
          .map { case (id, ts) =>
            id -> (prior + ts.map(tk =>
              math.log(cPos.getOrElse(tk, 0) + 1.0) -
                math.log(nPos + v) -
                math.log(cNeg.getOrElse(tk, 0) + 1.0) +
                math.log(nNeg + v)).sum)
          }.toMap
        val got = LlmCorpus.qualityClf(
            docs.toDF("doc_id", "text", "source"), trusted = Seq("tr"))
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Double]("score"), r.getAs[Boolean]("pred")))).toMap
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got.keySet == expected.keySet, s"seed=${7000 + i}")
        got.foreach { case (id, (s, p)) =>
          // engine emits round(score, 6); round ours the same way
          assert(math.abs(s - r6(expected(id))) < 1e-9,
            s"seed=${7000 + i} id=$id")
          if (math.abs(expected(id)) > 1e-9)
            assert(p == (expected(id) > 0), s"seed=${7000 + i} id=$id")
        }
      }
    }
  }

  test("keywords matches brute-force tf-idf ranking") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      val tf = docs.flatMap { case (id, t) => toks(t).map(id -> _) }
        .groupBy(identity).map { case ((id, tk), v) => (id, tk, v.size) }
      val dfc = tf.groupBy(_._2).map { case (tk, v) => tk -> v.size }
      val n = docs.size
      val expected = tf.groupBy(_._1).map { case (id, g) =>
        id -> g.toSeq.map { case (_, tk, f) =>
            (tk, f * (math.log((n + 1.0) / (dfc(tk) + 1.0)) + 1.0))
          }.sortBy { case (tk, x) => (-x, tk) }.take(LlmCorpus.KeywordsK)
      }
      val got = LlmCorpus.keywords(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
          ((r.getAs[String]("term"), r.getAs[Double]("tfidf"))))
        .groupBy(_._1._1).map { case (id, g) =>
          id -> g.toSeq.sortBy(_._1._2).map(_._2)
        }
      assert(got.keySet == expected.keySet, s"seed=${7000 + i}")
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      got.foreach { case (id, ks) =>
        val eks = expected(id)
        assert(ks.map(_._1) == eks.map(_._1), s"seed=${7000 + i} id=$id")
        ks.zip(eks).foreach { case ((_, x), (_, ex)) =>
          // engine emits round(tfidf, 6); round ours the same way
          assert(math.abs(x - r6(ex)) < 1e-9, s"seed=${7000 + i} id=$id")
        }
      }
    }
  }

  test("vocabEncode matches brute-force top-k encoding") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      val k = 3
      val cnt = docs.flatMap(d => toks(d._2))
        .groupBy(identity).map { case (t, v) => t -> v.size }
      val ids = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
        .zipWithIndex.map { case ((t, _), j) => t -> (j + 1L) }.toMap
      val expected = docs.flatMap { case (id, t) =>
        toks(t).zipWithIndex.map { case (tk, p) =>
          (id, p + 1L) -> ids.getOrElse(tk, 0L)
        }
      }.toMap
      val got = LlmCorpus.vocabEncode(docs.toDF("doc_id", "text"), k = k)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
          r.getAs[Long]("token_id")).toMap
      assert(got == expected, s"seed=${7000 + i}")
    }
  }

  test("shuffleShards is a permutation: every doc exactly once") {
    import spark.implicits._
    for (i <- 0 until 3) {
      val docs = corpus(i)
      val out = LlmCorpus.shuffleShards(docs.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("seq")))
      assert(out.map(_._1).toSet == docs.map(_._1).toSet)
      assert(out.forall(t => t._2 >= 0 && t._2 < LlmCorpus.ExportShards))
      out.groupBy(_._2).foreach { case (_, g) =>
        assert(g.map(_._3).sorted.toSeq == (1L to g.size).toSeq)
      }
    }
  }
}
