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
