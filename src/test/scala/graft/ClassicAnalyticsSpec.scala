package graft

import org.apache.spark.sql.functions._

import graft.operators.ClassicQueries

/** Hand fixtures for the DataFrame-level event-analytics helpers. */
class ClassicAnalyticsSpec extends GraftSuite {
  import spark.implicits._

  test("outlierAudit: singleton group reports 0 outliers, not NULL") {
    // one-row group → stddev_samp NULL → the flag is NULL per row; the
    // count must still be a total 0 (the oracle's CASE … ELSE 0)
    val ev = Seq(("solo", 5.0), ("big", 0.0), ("big", 0.0),
      ("big", 0.0), ("big", 100.0)).toDF("event_type", "value")
    val got = ClassicQueries.outlierAudit(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_outliers")))).toMap
    assert(got("solo") == ((1L, 0L)))
    // sanity: mu=25, sigma=50 → |100-25| = 75 < 2σ=100 → 0 outliers;
    // tighten: with three 0s and one 100 nothing crosses 2σ
    assert(got("big")._1 == 4L)
  }

  test("outlierAudit: a clear outlier is counted") {
    val ev = (Seq.fill(20)(("t", 10.0)) :+ (("t", 1000.0)))
      .toDF("event_type", "value")
    val got = ClassicQueries.outlierAudit(ev).collect()(0)
    assert(got.getAs[Long]("n_outliers") == 1L)
  }

  test("sessionPathsOf: path is time-ordered and capped at 5") {
    val ev = Seq(
      (1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"), (3L, 10L, 150L, "c"),
      (4L, 10L, 300L, "d"), (5L, 10L, 400L, "e"), (6L, 10L, 500L, "f"),
      // second session after a >30min gap
      (7L, 10L, 500L + 1801L, "z"))
      .toDF("event_id", "user_id", "sec", "event_type")
      .select($"event_id", $"user_id",
        timestamp_seconds($"sec").as("ts"), $"event_type")
    val got = ClassicQueries.sessionPathsOf(ev)
      .orderBy($"session_id").collect()
      .map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_events"),
        r.getAs[String]("path")))
    assert(got.toSeq == Seq((1L, 6L, "a>c>b>d>e"), (2L, 1L, "z")))
  }
}
