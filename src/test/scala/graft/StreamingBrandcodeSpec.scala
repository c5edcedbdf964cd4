package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{BrandcodeResolve, CoAggregate, Sessionize}
import graft.streaming.StreamingBrandcode
import graft.streaming.StreamingBrandcode.{BcOut, EvB}

/** Batch/stream parity for the fused streaming brandcode resolver: the
  * rows emitted across micro-batches must equal the batch
  * BrandcodeResolve output minus each line's final (still-open) CO.
  *
  * UPTIME values follow the canonical derivation (gap to the previous
  * event's end, clamped at 0) — the streaming operator's window-close
  * bound relies on that invariant of the deduped log. */
class StreamingBrandcodeSpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)
  private def isCo(e: Ev) = e.c1 == "co"

  private def toEvB(e: Ev): EvB = EvB(
    e.LINE, e.id.toString, e.id, e.start.toDouble,
    e.start.toDouble + e.DOWNTIME * 60,
    s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE, e.UPTIME, isCo(e))

  // Shapes covered: pre-CO history event feeding the zero-uptime-at-
  // boundary preference (id=0/1 → Current B9), Next differing (OK),
  // Next present but identical (Not Changed), Current from the CO's own
  // first event, and open tail sessions per line.
  private val events = Seq(
    Ev("L1", 400, 10.0, id = 0, BRANDCODE = "B9"),
    Ev("L1", 1000, 10.0, c1 = "co", id = 1, BRANDCODE = "B1"),
    Ev("L1", 3400, 1.0, id = 2, BRANDCODE = "B2", UPTIME = 30.0),
    Ev("L1", 7000, 5.0, c1 = "co", id = 3, BRANDCODE = "B3",
      UPTIME = 59.0),
    Ev("L1", 20500, 1.0, c1 = "co", id = 4, BRANDCODE = "B3",
      UPTIME = 220.0),
    Ev("L1", 40000, 1.0, c1 = "co", id = 5, BRANDCODE = "B5",
      UPTIME = 324.0),
    Ev("L2", 1000, 1.0, c1 = "co", id = 6, BRANDCODE = "B1"),
    Ev("L2", 5260, 1.0, c1 = "co", id = 7, BRANDCODE = "B1",
      UPTIME = 70.0),
    Ev("L2", 49960, 1.0, c1 = "co", id = 8, BRANDCODE = "B2",
      UPTIME = 744.0))

  private def batchMinusOpen: Set[(String, String, String, String)] = {
    val dt = dtLog(events: _*)
    val agg = CoAggregate(Sessionize(
      dt.filter(col("CAUSE_LEVELS_1_NAME") === "co"), P))
    val w = Window.partitionBy("LINE").orderBy(col("CO_Start_EPOCH").desc)
    val openIds = agg.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("CO_Identifier").collect().map(_.getString(0)).toSet
    BrandcodeResolve(agg, dt).collect()
      .map(r => (r.getAs[String]("CO_Identifier"), r.getAs[String]("LINE"),
        r.getAs[String]("Current_BRANDCODE"),
        r.getAs[String]("Next_BRANDCODE") + "|" +
          r.getAs[String]("Brandcode_Status")))
      .filterNot(t => openIds.contains(t._1)).toSet
  }

  test("closed-CO brandcode rows across micro-batches match the batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvB]
    val query = StreamingBrandcode(input.toDS(), P)
      .writeStream.format("memory").queryName("bc_out")
      .outputMode(OutputMode.Append).start()
    try {
      // split mid-session: CO A's Next window spans both batches
      input.addData(events.take(2).map(toEvB))
      query.processAllAvailable()
      input.addData(events.drop(2).map(toEvB))
      query.processAllAvailable()
      val got = spark.table("bc_out").as[BcOut].collect().map { o =>
        (o.CO_Identifier, o.LINE, o.Current_BRANDCODE,
          o.Next_BRANDCODE + "|" + o.Brandcode_Status)
      }.toSet
      assert(got == batchMinusOpen)
      assert(got.size == 5) // L1 closes 3 COs, L2 closes 2
      // the zero-uptime boundary preference: CO A resolves to the
      // PRE-CO event's brandcode, not the CO's own
      assert(got.exists(t => t._2 == "L1" && t._3 == "B9"))
    } finally query.stop()
  }
}
