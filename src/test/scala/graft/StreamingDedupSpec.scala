package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDedup

/** Cross-batch duplicate collapse with bounded state. */
class StreamingDedupSpec extends GraftSuite {
  import spark.implicits._

  case class E(START_TIME: java.sql.Timestamp, LINE: String, id: Long)

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")

  test("duplicates collapse to one row even across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[E]
    val query = StreamingDedup(input.toDF())
      .writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append).start()
    try {
      // in-batch duplicate pair + a singleton
      input.addData(E(ts(1), "L1", 1), E(ts(1), "L1", 2), E(ts(2), "L2", 3))
      query.processAllAvailable()
      // cross-batch duplicate of (L1, 00:01) inside the watermark
      input.addData(E(ts(1), "L1", 4), E(ts(3), "L1", 5))
      query.processAllAvailable()
      val rows = spark.table("dd_out")
        .select($"LINE", $"START_TIME").collect()
        .map(r => s"${r.getString(0)}@${r.getTimestamp(1)}").sorted.toSeq
      assert(rows == Seq("L1@2026-01-01 00:01:00.0", "L1@2026-01-01 00:03:00.0",
        "L2@2026-01-01 00:02:00.0"))
    } finally query.stop()
  }
}
