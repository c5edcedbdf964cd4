package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{CoAggregate, GanttGenerate, Sessionize}
import graft.streaming.StreamingGantt
import graft.streaming.StreamingGantt.GEv

/** Batch/stream parity for the streaming Gantt twin: assigned pairs
  * emitted across micro-batches, pushed through the SHARED batch point
  * kernel, must equal batch `ganttData` restricted to the stream's
  * closed COs (a line's final CO never closes; its window is only
  * fixed by the next session). */
class StreamingGanttSpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)
  private def isCo(e: Ev) = e.c1 == "co"
  private def isCons(e: Ev) = e.MACHINE == e.LINE + " M0"

  private def toGEv(e: Ev): GEv = GEv(
    e.LINE, e.MACHINE, e.id.toString, e.id, e.start.toDouble,
    e.start.toDouble + e.DOWNTIME * 60, e.DOWNTIME, e.UPTIME,
    s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE, isCo(e), isCons(e),
    // J6: a row's id is in the session log iff the row is a CO event
    coEvent = isCo(e), planned = e.planned, idle = e.idle)

  // Shapes covered: events on both machine kinds inside a window, an
  // event past the window end (id=4, excluded by the strict `< max_t`
  // guard), a planned constraint stop (status 1.7), CO rows on the
  // constraint machine (status 1 via the J6 flag), overlapping-free
  // multi-CO lines, and open tail sessions per line.
  private val events = Seq(
    Ev("L1", 10000, 10.0, c1 = "co", id = 1, MACHINE = "L1 M0",
      UPTIME = 0.5),
    Ev("L1", 10800, 2.0, id = 2, MACHINE = "L1 M1", UPTIME = 3.0),
    Ev("L1", 11000, 1.5, id = 3, MACHINE = "L1 M0", UPTIME = 0.25,
      planned = 1),
    Ev("L1", 11600, 0.25, id = 4, MACHINE = "L1 M1", UPTIME = 1.0),
    Ev("L1", 40000, 5.0, c1 = "co", id = 5, MACHINE = "L1 M0",
      UPTIME = 10.0),
    Ev("L1", 40500, 1.0, id = 6, MACHINE = "L1 M1", UPTIME = 2.0),
    Ev("L1", 80000, 2.0, c1 = "co", id = 7, MACHINE = "L1 M0",
      UPTIME = 5.0),
    Ev("L2", 5000, 3.0, c1 = "co", id = 8, MACHINE = "L2 M0",
      UPTIME = 0.0),
    Ev("L2", 5100, 1.0, id = 9, MACHINE = "L2 M1", UPTIME = 1.0),
    Ev("L2", 50000, 1.0, c1 = "co", id = 10, MACHINE = "L2 M0",
      UPTIME = 2.0))

  private type Pt = (String, String, String, Long, Double, Double, String)
  private def rows(df: org.apache.spark.sql.DataFrame): Set[Pt] =
    df.select(col("CO_Identifier"), col("Line"), col("Machine"),
      col("seq"), col("StartTime"), col("Downtime_Status"),
      col("downtime_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getString(6)))
      .toSet

  test("closed-CO Gantt points across micro-batches match batch ganttData") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GEv]
    val query = StreamingGantt(input.toDS(), P)
      .writeStream.format("memory").queryName("gantt_assigned")
      .outputMode(OutputMode.Append).start()
    try {
      // split mid-window: CO-A's machine events span both batches
      input.addData(events.take(3).map(toGEv))
      query.processAllAvailable()
      input.addData(events.drop(3).map(toGEv))
      query.processAllAvailable()
      val assigned = spark.table("gantt_assigned")
      val streamedCos = assigned.select("CO_Identifier").distinct()
        .as[String].collect().toSet

      val dt = dtLog(events: _*)
      val ses = Sessionize(dt.filter(col("CAUSE_LEVELS_1_NAME") === "co"), P)
      val agg = CoAggregate(ses)
      val consLog = GanttGenerate.constraintLog(dt, ses, Seq("M0"))
      // every non-final CO per line must have closed in the stream
      val wLine = Window.partitionBy("LINE")
        .orderBy(col("CO_Start_EPOCH").desc)
      val closed = agg.withColumn("__rn", row_number().over(wLine))
        .filter(col("__rn") > 1).select("CO_Identifier")
        .as[String].collect().toSet
      assert(streamedCos == closed, "stream must close exactly the " +
        "non-final COs (flushed once an event passes the window end)")

      val batch = GanttGenerate.ganttData(agg, dt, consLog)
        .filter(col("CO_Identifier").isin(closed.toSeq: _*))
      val got = rows(StreamingGantt.points(assigned))
      assert(got == rows(batch))
      // the status vocabulary actually exercised end-to-end
      val statuses = got.map(_._6)
      assert(Set(1.0, 1.7, 2.0, 3.0).subsetOf(statuses),
        s"expected CO/planned/non-constraint/uptime points, got $statuses")
    } finally query.stop()
  }
}
