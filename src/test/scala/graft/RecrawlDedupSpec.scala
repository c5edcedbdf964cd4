package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.LlmPrep

/** [[LlmPrep.recrawlDedup]] contract: gap-session openers are kept,
  * the gap is measured to the IMMEDIATE predecessor (kept or dropped),
  * ties break by id, NULL timestamps drop. */
class RecrawlDedupSpec extends GraftSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("chain semantics: gap is to the previous row, not the last kept") {
    // gap 15s; rows at 0, 10, 20: row@20 is 20s after the kept row@0
    // but only 10s after the (dropped) row@10 -> still dropped
    val df = Seq((1L, "u", ts(0)), (2L, "u", ts(10)), (3L, "u", ts(20)),
      (4L, "u", ts(40))).toDF("id", "key", "t")
    val kept = LlmPrep.recrawlDedup(df, Seq("key"), "t", "id", 15L)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("independent keys, exact boundary is NOT a new session") {
    // gap must be STRICTLY greater: 30s after with gap 30 -> dropped
    val df = Seq((1L, "a", ts(0)), (2L, "a", ts(30)), (3L, "a", ts(31)),
      (4L, "b", ts(5))).toDF("id", "key", "t")
    val kept = LlmPrep.recrawlDedup(df, Seq("key"), "t", "id", 30L)
      .select("id").as[Long].collect().sorted
    // row2 at +30 is within (not >) the window; row3 is 1s after row2
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("timestamp ties keep the lowest id; NULL timestamps drop") {
    val df = Seq(
      (Option(ts(0)), 2L), (Option(ts(0)), 1L), (None, 3L)
    ).toDF("t", "id").withColumn("key", lit("k"))
    val kept = LlmPrep.recrawlDedup(df, Seq("key"), "t", "id", 10L)
      .select("id").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }

  test("kept set ≡ session openers of sessionizeByGap") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 400L).map { i =>
      (i, s"k${rnd.nextInt(5)}", ts(rnd.nextInt(3600).toLong))
    }.toDF("id", "key", "t")
    val kept = LlmPrep.recrawlDedup(df, Seq("key"), "t", "id", 120L)
      .select("id")
    val sessions = graft.operators.TemporalJoins
      .sessionizeByGap(df, Seq("key"), "t", 120L)
    val openers = sessions
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key"), col("session_id"))
          .orderBy(col("t"), col("id"))))
      .filter(col("__rn") === 1).select("id")
    assert(kept.exceptAll(openers).isEmpty && openers.exceptAll(kept).isEmpty)
  }
}
