package graft

import org.apache.spark.sql.functions._

import graft.operators.{ClassicQueries, LlmPrep}

/** [[LlmPrep.collocations]] hand-checked PMI + screening, and
  * [[ClassicQueries.winsorize]] clamp-accounting invariants. */
class CollocationsSpec extends GraftSuite {
  import spark.implicits._

  test("pmi: hand-computed score, minCount screen, rank order") {
    // corpus: "a b" x4, "a c" x2, "c c" x2 -> 8 pairs? construct
    // per-doc texts so adjacency is explicit:
    val docs = (Seq.fill(4)("a b") ++ Seq.fill(2)("a c") ++
      Seq.fill(2)("c c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = LlmPrep.collocations(docs, minCount = 2L, k = 10)
      .orderBy("rank")
      .select("pair", "n", "pmi").as[(String, Long, Double)]
      .collect().toSeq
    // tokens: a x6, b x4, c x6; n_uni=16, pairs: ab=4, ac=2, cc=2; n_pair=8
    def pmi(nab: Long, na: Long, nb: Long): Double =
      BigDecimal(math.log((nab.toDouble / 8.0) /
        ((na.toDouble / 16.0) * (nb.toDouble / 16.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // "a c" and "c c" tie on pmi (same nab and na*nb) -> lexical order
    assert(out.map(_._1) == Seq("a b", "a c", "c c"))
    assert(out(0) == (("a b", 4L, pmi(4, 6, 4))))
    assert(out(1) == (("a c", 2L, pmi(2, 6, 6))))
    assert(out(2) == (("c c", 2L, pmi(2, 6, 6))))
    // minCount=5 screens everything but "a b"
    assert(LlmPrep.collocations(docs, minCount = 4L, k = 10).count() == 1)
  }

  test("winsorize: clip counts + bounds ordering invariants at sf0.001") {
    val rows = ClassicQueries.winsorize(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p75) = (r.getDouble(1), r.getDouble(2))
      val (wAvg, nLo, nHi, n) = (r.getDouble(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
      assert(p25 <= p75)
      assert(wAvg >= p25 && wAvg <= p75,
        "clamped mean must lie inside the clamp interval")
      // exact type-7 quartiles put ~25% strictly below/above
      assert(nLo <= n / 2 && nHi <= n / 2 && nLo + nHi < n)
    }
  }
}
