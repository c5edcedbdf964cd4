package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.EvIn

/** Batch/stream parity: replaying events through micro-batches must
  * reproduce the batch Sessionize assignment exactly. */
class StreamingSessionizeSpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)

  private def toEvIn(e: Ev): EvIn = EvIn(
    e.LINE, e.id.toString, e.id, e.start.toDouble,
    e.start.toDouble + e.DOWNTIME * 60,
    s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE)

  private val events = Seq(
    Ev("L1", 1000, 10, id = 1),
    Ev("L1", 2800, 10, id = 2),               // joins CO 1 (gap 20 < 30)
    Ev("L1", 2800 + 4000, 10, id = 3, c1 = "x", BRANDCODE = "B9"),
    Ev("L2", 1000, 10, id = 4),
    Ev("L2", 9000, 10, id = 5, BRANDCODE = "B3"),
    Ev("L2", 9700, 10, id = 6, BRANDCODE = "B3"))

  private def batchExpected: Map[String, (Int, String)] =
    Sessionize(dtLog(events: _*), P)
      .select("downtime_id", "CO_Trigger", "CO_Identifier")
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2))))
      .toMap

  test("multi-batch stream matches batch sessionization exactly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvIn]
    val query = StreamingSessionize(input.toDS(), P)
      .writeStream.format("memory").queryName("ses_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: first events per line; batch 2: the later arrivals
      input.addData(events.take(2).map(toEvIn))
      query.processAllAvailable()
      input.addData(events.drop(2).map(toEvIn))
      query.processAllAvailable()
      val got = spark.table("ses_out").as[StreamingSessionize.EvOut]
        .collect()
        .map(o => o.downtime_id -> ((o.CO_Trigger, o.CO_Identifier)))
        .toMap
      assert(got == batchExpected)
    } finally query.stop()
  }

  test("state carries across batches (gap rule spans the batch boundary)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvIn]
    val query = StreamingSessionize(input.toDS(), P)
      .writeStream.format("memory").queryName("ses_out2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Seq(toEvIn(Ev("L9", 1000, 10, id = 1))))
      query.processAllAvailable()
      // arrives in the NEXT batch, 20 min after the previous end: same CO
      input.addData(Seq(toEvIn(Ev("L9", 2800, 10, id = 2))))
      query.processAllAvailable()
      val got = spark.table("ses_out2").as[StreamingSessionize.EvOut]
        .collect().map(o => o.downtime_id -> o.CO_Trigger).toMap
      assert(got == Map("1" -> 1, "2" -> 0))
    } finally query.stop()
  }
}
