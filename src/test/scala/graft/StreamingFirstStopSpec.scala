package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{CoAggregate, FirstStopAfterCo, Sessionize}
import graft.streaming.StreamingFirstStop
import graft.streaming.StreamingFirstStop.{EvFs, FsOut}

/** Batch/stream parity for the fused streaming first-stop operator:
  * rows emitted across micro-batches must equal the batch
  * firstStops + uptimeTillNextCo results minus each line's final
  * (still-open) CO. */
class StreamingFirstStopSpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)
  private def isCo(e: Ev) = e.c1 == "co"

  private def toEvFs(e: Ev): EvFs = EvFs(
    e.LINE, e.id.toString, e.id, e.start.toDouble,
    e.start.toDouble + e.DOWNTIME * 60, e.DOWNTIME, e.UPTIME,
    s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE, isCo(e),
    e.planned, e.idle, e.excluded)

  // exact binary fractions only → no FP-rounding ambiguity vs batch.
  // Shapes covered: event inside the CO span (id=2, pruned), planned /
  // excluded candidates (count toward sums, never first), a window with
  // NO qualifying stop (L1 session B), an event at exactly the CO end
  // (id=10, zero-gap edge, included), and open tail sessions per line.
  private val events = Seq(
    Ev("L1", 1000, 10.0, c1 = "co", id = 1, UPTIME = 0.5),
    Ev("L1", 1300, 1.0, id = 2, UPTIME = 0.25),        // t < CO end
    Ev("L1", 2000, 2.0, id = 3, UPTIME = 2.0, planned = 1),
    Ev("L1", 3000, 1.5, id = 4, UPTIME = 1.5),         // first stop A
    Ev("L1", 4000, 0.5, id = 5, UPTIME = 0.25),
    Ev("L1", 20000, 5.0, c1 = "co", id = 6, UPTIME = 4.5), // opens B
    Ev("L1", 30000, 1.0, id = 7, UPTIME = 1.0, excluded = true),
    Ev("L1", 40000, 2.0, c1 = "co", id = 8, UPTIME = 2.0), // opens C
    Ev("L2", 1000, 2.0, c1 = "co", id = 9, UPTIME = 0.0),
    Ev("L2", 1120, 3.0, id = 10, UPTIME = 0.5),        // t == CO end
    Ev("L2", 50000, 4.0, c1 = "co", id = 11, UPTIME = 3.0)) // opens L2-B

  /** (co_id, line, total, first id, first epoch, dt, up, cumul) per
    * closed CO, from the BATCH operators. */
  private def batchMinusOpen: Set[(String, String, Double, Option[String],
      Option[Double], Option[Double], Option[Double], Option[Double])] = {
    val dt = dtLog(events: _*)
    val agg = CoAggregate(Sessionize(dt.filter(col("CAUSE_LEVELS_1_NAME")
      === "co"), P))
    val w = Window.partitionBy("LINE").orderBy(col("CO_Start_EPOCH").desc)
    val closed = agg.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
    val fs = FirstStopAfterCo.firstStops(agg, dt).collect()
      .map(r => r.getAs[String]("CO_Identifier") ->
        ((r.getAs[String]("downtime_id"),
          r.getAs[java.sql.Timestamp]("START_TIME").getTime / 1000.0,
          r.getAs[Double]("DOWNTIME"), r.getAs[Double]("UPTIME"),
          r.getAs[Double]("Uptime_cumul")))).toMap
    val up = FirstStopAfterCo.uptimeTillNextCo(agg, dt).collect()
      .map(r => r.getAs[String]("CO_Identifier") ->
        r.getAs[Double]("Total_Uptime_till_Next_CO")).toMap
    closed.select("CO_Identifier", "LINE").collect().map { r =>
      val (id, line) = (r.getString(0), r.getString(1))
      val f = fs.get(id)
      (id, line, up(id), f.map(_._1), f.map(_._2), f.map(_._3),
        f.map(_._4), f.map(_._5))
    }.toSet
  }

  test("closed-CO windows across micro-batches match the batch operators") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvFs]
    val query = StreamingFirstStop(input.toDS(), P)
      .writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split mid-window: A's candidates span both batches
      input.addData(events.take(4).map(toEvFs))
      query.processAllAvailable()
      input.addData(events.drop(4).map(toEvFs))
      query.processAllAvailable()
      val got = spark.table("fs_out").as[FsOut].collect().map { o =>
        (o.CO_Identifier, o.LINE, o.Total_Uptime_till_Next_CO,
          o.first_downtime_id, o.first_START_EPOCH, o.first_DOWNTIME,
          o.first_UPTIME, o.Uptime_cumul)
      }.toSet
      assert(got == batchMinusOpen)
      // L1 closes A (stop id=4) and B (no qualifying stop); L2 closes A
      assert(got.size == 3)
      assert(got.count(_._4.isEmpty) == 1)
    } finally query.stop()
  }
}
