package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize
import graft.streaming.{StreamingSessionize, StreamingSessionizeLate}
import graft.streaming.StreamingSessionize.EvIn

/** [[StreamingSessionizeLate]] — out-of-order arrival inside the
  * watermark still reproduces the batch Sessionize assignment. */
class StreamingSessionizeLateSpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)

  private def toEvIn(e: Ev): EvIn = EvIn(
    e.LINE, e.id.toString, e.id, e.start.toDouble,
    e.start.toDouble + e.DOWNTIME * 60,
    s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE)

  private def run(batches: Seq[Seq[EvIn]], delay: String,
      sink: String): Map[String, (Int, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvIn]
    val query = StreamingSessionizeLate(input.toDS(), P, delay)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    spark.table(sink).as[StreamingSessionize.EvOut]
      .collect()
      .map(o => o.downtime_id -> ((o.CO_Trigger, o.CO_Identifier)))
      .toMap
  }

  test("late event lands in the right changeover; streamed ≡ batch") {
    // id=2 belongs INSIDE line L1's first CO (gap 20 min) but arrives
    // a batch AFTER id=3 opened a later one — the ordered operator
    // would mis-fold it; the buffer must reorder before folding
    val events = Seq(
      Ev("L1", 100000, 10, id = 1),
      Ev("L1", 101800, 10, id = 2),
      Ev("L1", 110000, 10, id = 3, c1 = "x", BRANDCODE = "B9"),
      Ev("L2", 100000, 10, id = 4),
      Ev("L2", 111000, 10, id = 5, BRANDCODE = "B3"))
    val expected = Sessionize(dtLog(events: _*), P)
      .select("downtime_id", "CO_Trigger", "CO_Identifier")
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    val e = events.map(toEvIn)
    val batches = Seq(
      Seq(e(0), e(3)),
      Seq(e(2)),          // id=3 arrives before its predecessor id=2
      Seq(e(1), e(4)),    // id=2 is ~2.3h late — within the 4h delay
      Seq(toEvIn(Ev("L9", 200000, 10, id = 91))),  // advance watermark
      Seq(toEvIn(Ev("L9", 200001, 10, id = 92))))  // fire timeouts
    val got = run(batches, "4 hours", "ses_late_out")
    val gotReal = got.view.filterKeys(k => k != "91" && k != "92").toMap
    assert(gotReal === expected)
  }

  test("randomized chops with held-back rows ≡ batch") {
    val rnd = new scala.util.Random(71)
    val events = Seq.tabulate(120) { i =>
      Ev(s"L${i % 3}", 100000L + rnd.nextInt(40000), 5,
        c1 = if (rnd.nextInt(4) == 0) "x" else "c1",
        BRANDCODE = s"B${rnd.nextInt(3)}", id = i + 1)
    }
    val expected = Sessionize(dtLog(events: _*), P)
      .select("downtime_id", "CO_Trigger", "CO_Identifier")
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    // time-sorted chops, a third of each held back one batch; the
    // 40000 s fixture span is inside the delay, so nothing drops
    val sorted = events.sortBy(_.start).map(toEvIn)
    val chops = scala.collection.mutable.ArrayBuffer.empty[Seq[EvIn]]
    var rest = sorted
    while (rest.nonEmpty) {
      val take = 4 + rnd.nextInt(20)
      chops += rest.take(take); rest = rest.drop(take)
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[EvIn]]
    var held = Seq.empty[EvIn]
    chops.foreach { c =>
      val (hold, now) = c.partition(_ => rnd.nextInt(3) == 0)
      batches += (held ++ now)
      held = hold
    }
    batches += held
    val all = batches.toSeq ++ Seq(
      Seq(toEvIn(Ev("L9", 400000, 5, id = 991))),
      Seq(toEvIn(Ev("L9", 400001, 5, id = 992))))
    val got = run(all, "12 hours", "ses_late_out2")
      .view.filterKeys(k => k != "991" && k != "992").toMap
    assert(got === expected)
  }
}
