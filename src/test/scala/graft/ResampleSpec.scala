package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Dense time-bin resampling: hand-checked grids, zero-filled holes,
  * forward-fill carry, NULL handling and the bin-explosion guard. */
class ResampleSpec extends GraftSuite {
  import spark.implicits._

  private def ev(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("k", "t_raw", "value")
      .select(col("k"), timestamp_seconds(col("t_raw")).as("ts"),
        col("value"))

  test("dense grid: every bin between first and last event, zeros in " +
    "the holes") {
    // key a: events in bins 0, 0 and 3 (width 10) -> bins 0..3
    val out = Resample.timeBins(
        ev(("a", 1L, 2.0), ("a", 9L, 3.0), ("a", 35L, 4.0),
          ("b", 100L, 1.0)),
        Seq("k"), "ts", "value", widthSec = 10L)
      .collect()
      .map(r => (r.getAs[String]("k"),
        r.getAs[java.sql.Timestamp]("bin_start").getTime / 1000,
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toSet
    assert(out == Set(
      ("a", 0L, 2L, 5.0), ("a", 10L, 0L, 0.0), ("a", 20L, 0L, 0.0),
      ("a", 30L, 1L, 4.0), ("b", 100L, 1L, 1.0)))
  }

  test("ffill carries the last non-empty bin's sum across the holes") {
    val out = Resample.timeBins(
        ev(("a", 1L, 2.0), ("a", 35L, 4.0)),
        Seq("k"), "ts", "value", widthSec = 10L, ffill = true)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("bin_start").getTime / 1000 ->
        r.getAs[Double]("last_value")).toMap
    assert(out == Map(0L -> 2.0, 10L -> 2.0, 20L -> 2.0, 30L -> 4.0))
  }

  test("NULL keys and NULL times are dropped; the guard fails loudly " +
    "on a mis-scaled width") {
    val df = Seq[(String, java.lang.Long, Double)](
      ("a", 5L, 1.0), (null, 7L, 2.0), ("a", null, 3.0))
      .toDF("k", "t_raw", "value")
      .select(col("k"), timestamp_seconds(col("t_raw")).as("ts"),
        col("value"))
    val out = Resample.timeBins(df, Seq("k"), "ts", "value", 10L)
    assert(out.count() == 1)
    val wide = ev(("a", 0L, 1.0), ("a", 1000000L, 1.0))
    val e = intercept[Exception] { quietly {
      Resample.timeBins(wide, Seq("k"), "ts", "value", 1L,
        maxBinsPerKey = Some(1000L)).collect()
    } }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" ")
    assert(chain.contains("maxBinsPerKey"), chain)
    // same span under the cap passes
    assert(Resample.timeBins(wide, Seq("k"), "ts", "value", 10000L,
      maxBinsPerKey = Some(1000L)).count() == 101L)
  }
}
