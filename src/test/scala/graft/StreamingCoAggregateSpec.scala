package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{CoAggregate, Sessionize}
import graft.streaming.StreamingCoAggregate
import graft.streaming.StreamingCoAggregate.EvAgg

/** Batch/stream parity for the fused streaming CO aggregate: the
  * closed COs emitted across micro-batches must equal the batch
  * CoAggregate rows minus each line's final (still-open) CO. */
class StreamingCoAggregateSpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)

  private def toEvAgg(e: Ev): EvAgg = EvAgg(
    e.LINE, e.id.toString, e.id, e.start.toDouble,
    e.start.toDouble + e.DOWNTIME * 60,
    s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE,
    e.DOWNTIME, e.UPTIME, e.MACHINE)

  // exact binary fractions only → no FP-rounding ambiguity vs batch
  private val events = Seq(
    Ev("L1", 1000, 10.5, id = 1, MACHINE = "M0", UPTIME = 2.25),
    Ev("L1", 2800, 0.5, id = 2, MACHINE = "M1"),     // same CO, 2nd machine
    Ev("L1", 9000, 8.0, id = 3, c1 = "x"),           // closes CO 1
    Ev("L1", 20000, 1.0, id = 4),                    // closes CO 2
    Ev("L2", 1000, 4.0, id = 5, MACHINE = "M7"),
    Ev("L2", 9000, 2.0, id = 6, BRANDCODE = "B3"),   // closes L2's CO 1
    Ev("L2", 9700, 2.5, id = 7, BRANDCODE = "B3"))   // same CO

  private def batchMinusOpen: Set[String] = {
    val agg = CoAggregate(Sessionize(dtLog(events: _*), P))
    val w = Window.partitionBy("LINE").orderBy(col("CO_Start_EPOCH").desc)
    agg.withColumn("__rn", row_number().over(w)).filter(col("__rn") > 1)
      .select("CO_Identifier", "LINE", "CO_Start_EPOCH", "CO_End_EPOCH",
        "CO_DOWNTIME", "downtime_id_of_First_CO_Event",
        "downtime_id_of_Last_CO_Event", "n_events", "first_ev_UPTIME",
        "Number_of_Machines", "CO_DOWNTIME_prorated")
      .collect().map(_.mkString("|")).toSet
  }

  test("closed COs across micro-batches equal batch agg minus open tails") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvAgg]
    val query = StreamingCoAggregate(input.toDS(), P)
      .writeStream.format("memory").queryName("coagg_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events.take(3).map(toEvAgg))
      query.processAllAvailable()
      input.addData(events.drop(3).map(toEvAgg))
      query.processAllAvailable()
      val got = spark.table("coagg_out")
        .select("CO_Identifier", "LINE", "CO_Start_EPOCH", "CO_End_EPOCH",
          "CO_DOWNTIME", "downtime_id_of_First_CO_Event",
          "downtime_id_of_Last_CO_Event", "n_events", "first_ev_UPTIME",
          "Number_of_Machines", "CO_DOWNTIME_prorated")
        .collect().map(_.mkString("|")).toSet
      assert(got == batchMinusOpen)
      assert(got.nonEmpty && got.size == 3) // L1 closes 2, L2 closes 1
    } finally query.stop()
  }
}
