package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LlmCorpus

/** [[LlmCorpus.profileSketch]] — the mergeable-profile contract:
  * split-merge equals whole-corpus, estimates inside the error
  * envelope, overlap absorbed by the sketch (not double-counted). */
class ProfileSketchSpec extends GraftSuite {
  import spark.implicits._

  private lazy val docs =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")

  private def estimates(profile: DataFrame): Map[String, (Long, Long, Long, Long)] =
    LlmCorpus.profileEstimate(profile).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))))
      .toMap

  test("merged split-batch profiles equal the whole-corpus profile") {
    val whole = estimates(LlmCorpus.profileSketch(docs))
    assert(whole.size > 1, "fixture sanity: several sources")
    val parts = (0 until 4).map(i =>
      LlmCorpus.profileSketch(docs.filter(pmod(col("doc_id"), lit(4)) === i)))
    val merged = estimates(LlmCorpus.mergeProfiles(parts.reduce(_ unionByName _)))
    assert(merged === whole)
  }

  test("estimates land inside the HLL error envelope of the exact counts") {
    val est = estimates(LlmCorpus.profileSketch(docs))
    val exact = docs
      .select(col("source"), col("doc_id"), col("text"),
        explode_outer(call_function("graft_tokens", col("text"))).as("tok"))
      .groupBy(col("source"))
      .agg(countDistinct(col("text")).as("dd"),
        countDistinct(col("tok")).as("vs"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    for ((src, (_, _, distinctDocs, vocab)) <- est) {
      val (dd, vs) = exact(src)
      // lgK=12 → ~1.6% stderr; 5% is > 3 sigma
      assert(math.abs(distinctDocs - dd) <= math.max(1L, dd / 20),
        s"$src distinct_docs est=$distinctDocs exact=$dd")
      assert(math.abs(vocab - vs) <= math.max(1L, vs / 20),
        s"$src vocab est=$vocab exact=$vs")
    }
  }

  test("length-histogram quantiles land in the exact quantile's bucket") {
    val est = LlmCorpus.profileEstimate(LlmCorpus.profileSketch(docs))
      .select(col("source"), col("p50_len"), col("p95_len"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val exact = docs
      .select(col("source"),
        size(call_function("graft_tokens", col("text"))).as("n"))
      .groupBy(col("source"))
      .agg(expr("percentile(n, 0.5)").as("p50"),
        expr("percentile(n, 0.95)").as("p95"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    def bucket(n: Double): Long =
      math.floor(math.log(n + 1) / math.log(2)).toLong
    for ((src, (p50, p95)) <- est) {
      val (e50, e95) = exact(src)
      // the log2 histogram can only promise the right BUCKET (≤2×)
      assert(bucket(p50.toDouble) === bucket(e50),
        s"$src p50 est=$p50 exact=$e50")
      assert(bucket(p95.toDouble) === bucket(e95),
        s"$src p95 est=$p95 exact=$e95")
    }
  }

  test("length buckets are bit-exact at the [2^b-1, 2^(b+1)-2] " +
      "boundaries (no floating-log off-by-one)") {
    // token counts sitting exactly ON both edges of several buckets;
    // floor(log2(n+1)) computed with integer arithmetic as reference
    val ns = Seq(0, 1, 2, 3, 6, 7, 8, 14, 15, 16, 30, 31, 32, 127, 128)
    val docs = ns.map(n => (n.toLong, s"src$n", Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val hist = LlmCorpus.profileSketch(docs)
      .select(col("source"), col("len_hist")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (n <- ns) {
      val want = 63 - java.lang.Long.numberOfLeadingZeros(n + 1L)
      val h = hist(s"src$n")
      assert(h(want) == 1L && h.sum == 1L,
        s"n=$n expected bucket $want, hist=$h")
    }
  }

  test("histograms merge element-wise; empty histogram gives NULL quantile") {
    val whole = LlmCorpus.profileSketch(docs)
      .select(col("source"), col("len_hist")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val parts = (0 until 3).map(i =>
      LlmCorpus.profileSketch(docs.filter(pmod(col("doc_id"), lit(3)) === i)))
    val merged = LlmCorpus.mergeProfiles(parts.reduce(_ unionByName _))
      .select(col("source"), col("len_hist")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged === whole)
    assert(whole.values.forall(_.sum > 0), "fixture sanity")
    // an all-zero histogram (external data, not producible by
    // profileSketch) yields NULL, not bucket 0
    val zeros = spark.sql(
      s"SELECT array(${Seq.fill(LlmCorpus.LenHistBuckets)("0L").mkString(",")}) AS h")
    assert(zeros.select(LlmCorpus.histQuantile(col("h"), 0.5))
      .head().isNullAt(0))
  }

  test("profile estimate plan stays whole-stage-codegen — no janino fallback") {
    // the earlier unrolled histQuantile put O(buckets²) expressions
    // into the aggregate's output method and blew janino's 64KB
    // limit — correct answers, but the WHOLE profile scan silently
    // ran interpreted; this pins the compile staying clean
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val probe = new AbstractAppender("graft-codegen-probe", null, null,
        true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.ERROR))
          errors.add(e.getMessage.getFormattedMessage)
    }
    probe.start()
    val lg = LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    lg.addAppender(probe)
    try {
      val est = LlmCorpus.profileEstimate(LlmCorpus.profileSketch(docs))
      est.collect()
      // sketch aggregates are ObjectHashAggregate (never codegen'd —
      // TypedImperativeAggregate buffers); the scan-side tokenize +
      // bucket project MUST be inside a WholeStageCodegen span,
      // rendered as "*(n)" in the executed plan tree
      val plan = est.queryExecution.executedPlan.toString
      assert(plan.contains("*("), plan)
    } finally { lg.removeAppender(probe); probe.stop() }
    assert(errors.isEmpty,
      s"codegen fell back to interpreted: ${errors.toArray.mkString("; ")}")
  }

  test("re-merging the same batch doubles counts but not distincts") {
    val p = LlmCorpus.profileSketch(docs)
    val once = estimates(p)
    val twice = estimates(LlmCorpus.mergeProfiles(p.unionByName(p)))
    for ((src, (nd, nt, dd, vs)) <- twice) {
      val (nd1, nt1, dd1, vs1) = once(src)
      assert(nd === 2 * nd1 && nt === 2 * nt1, s"$src counts sum")
      assert(dd === dd1 && vs === vs1, s"$src overlap absorbed")
    }
  }
}
