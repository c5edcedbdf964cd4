package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmCorpus

/** [[LlmCorpus.calibrateBySource]] and
  * [[LlmCorpus.distinctiveTerms]] semantics on hand fixtures. */
class CalibrationSpec extends GraftSuite {
  import spark.implicits._

  test("calibration: per-source ranks, cross-source comparability") {
    // source A: scores spread; source B: one doc (pct 0, bucket 0)
    val docs = Seq(
      (1L, "a a a a", "A"), (2L, "a b c d", "A"), (3L, "a a b b", "A"),
      (4L, "x y", "B")
    ).toDF("doc_id", "text", "source")
    val out = LlmCorpus.calibrateBySource(docs)
      .select("doc_id", "pct", "bucket")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // within A: doc1 (zero entropy) < doc3 (1 bit) < doc2 (2 bits)
    assert(out(1L) == ((0.0, 0L)))
    assert(out(3L) == ((0.5, 5L)))
    assert(out(2L) == ((1.0, 9L)), "top of source gets pct 1 -> bucket 9")
    assert(out(4L) == ((0.0, 0L)), "singleton source ranks 0")
    // bucket is a deterministic function of within-source rank only:
    // B's sole doc and A's worst doc share bucket 0 despite different
    // raw scores — that IS the calibration
  }

  test("distinctive terms: a source-exclusive token tops its source") {
    // "common" is perfectly balanced (z = 0 for both sides), so the
    // source-exclusive tokens must win
    val docs = Seq(
      (1L, "common common common zebra zebra zebra", "A"),
      (2L, "common common common", "B"),
      (3L, "yak yak yak", "B")
    ).toDF("doc_id", "text", "source")
    val out = LlmCorpus.distinctiveTerms(docs, k = 2)
      .orderBy("source", "rank")
      .as[(String, String, Long, Double, Long)].collect()
    val topA = out.filter(_._1 == "A").head
    val topB = out.filter(_._1 == "B").head
    assert(topA._2 == "zebra" && topA._5 == 1L)
    assert(topB._2 == "yak" && topB._5 == 1L)
    // the shared token is never the most distinctive of either side
    assert(!out.exists(r => r._2 == "common" && r._5 == 1L))
    // z of an exclusive token is positive for its source
    assert(topA._4 > 0 && topB._4 > 0)
  }
}
