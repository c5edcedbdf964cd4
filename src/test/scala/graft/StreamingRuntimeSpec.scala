package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingRuntime

/** Watermarked windowed aggregation over a simulated stream. */
class StreamingRuntimeSpec extends GraftSuite {
  import spark.implicits._

  case class E(START_TIME: java.sql.Timestamp, LINE: String,
      UPTIME: Double, DOWNTIME: Double)

  private def ts(hour: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-0${hour / 24 + 1}%d " +
      f"${hour % 24}%02d:00:00")

  test("daily windows aggregate uptime per line with a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val query = StreamingRuntime(input.toDF())
      .writeStream.format("memory").queryName("rt_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        E(ts(1), "L1", 10, 1), E(ts(5), "L1", 20, 2),
        E(ts(3), "L2", 5, 0.5))
      query.processAllAvailable()
      // next day far past the watermark finalizes day 1
      input.addData(E(ts(26), "L1", 7, 0.7), E(ts(49), "L1", 1, 0.1))
      query.processAllAvailable()
      val rows = spark.table("rt_out")
        .select(date_format(col("window_start"), "yyyy-MM-dd").as("d"),
          col("LINE"), col("Runtime"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getDouble(2)).toMap
      assert(rows(("2026-01-01", "L1")) == 30.0)
      assert(rows(("2026-01-01", "L2")) == 5.0)
    } finally query.stop()
  }
}
