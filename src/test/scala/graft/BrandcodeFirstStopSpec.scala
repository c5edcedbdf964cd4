package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BrandcodeResolve, CoAggregate, FirstStopAfterCo, Sessionize}

/** Golden cases for the as-of brandcode lookups and the first-stop
  * windows, driven through the real Sessionize→CoAggregate spine. */
class BrandcodeFirstStopSpec extends GraftSuite {

  private val P = Sessionize.Params(triggerParam = 30.0)

  /** Sessionize `coEvs` (the CO-filtered set), aggregate, then resolve
    * against `full` (CO events ∪ plain events). */
  private def resolve(coEvs: Seq[Ev], plain: Seq[Ev]): DataFrame = {
    val agg = CoAggregate(Sessionize(dtLog(coEvs: _*), P))
    BrandcodeResolve(agg, dtLog(coEvs ++ plain: _*))
  }

  // One CO on L1: events at 10000 (10 min) -> CO [10000, 10600].
  private val co = Seq(Ev("L1", 10000, 10, id = 100, BRANDCODE = "BC"))

  test("current brandcode = last event before CO start within bounds") {
    val out = resolve(co, Seq(
      Ev("L1", 8000, 1, id = 1, BRANDCODE = "B1"),
      Ev("L1", 9000, 1, id = 2, BRANDCODE = "B2", UPTIME = 5)))
    val r = out.collect().head
    assert(r.getAs[String]("Current_BRANDCODE") == "B2")
  }

  test("current falls back to the CO's own first event when nothing precedes") {
    // only event in (start-3600, start] is the CO event itself (uptime>0)
    val out = resolve(
      Seq(Ev("L1", 10000, 10, id = 100, BRANDCODE = "BC", UPTIME = 2)),
      Seq(Ev("L1", 2000, 1, id = 1, BRANDCODE = "B9"))) // before window
    assert(out.collect().head.getAs[String]("Current_BRANDCODE") == "BC")
  }

  test("zero-uptime event at CO start is dispreferred but still a fallback") {
    // CO event at start has UPTIME=0 (uptime-start == co-start: tier 2);
    // an earlier in-window event wins tier 1.
    val out = resolve(co, Seq(
      Ev("L1", 9500, 1, id = 2, BRANDCODE = "B7", UPTIME = 1)))
    assert(out.collect().head.getAs[String]("Current_BRANDCODE") == "B7")
    // with NO earlier event, the zero-uptime boundary event is used
    val out2 = resolve(co, Nil)
    assert(out2.collect().head.getAs[String]("Current_BRANDCODE") == "BC")
  }

  test("next brandcode = first differing event by start time; else current") {
    val out = resolve(co, Seq(
      Ev("L1", 9500, 1, id = 2, BRANDCODE = "B7", UPTIME = 1),
      // uptime-start 11000 - 60 in (10000, 10600+3600): in next-window
      Ev("L1", 11000, 1, id = 3, BRANDCODE = "B7", UPTIME = 1),
      Ev("L1", 12000, 1, id = 4, BRANDCODE = "B8", UPTIME = 1)))
    val r = out.collect().head
    assert(r.getAs[String]("Next_BRANDCODE") == "B8")
    assert(r.getAs[String]("Brandcode_Status") == "OK")
    // only same-brand events after -> Next = Current, "Not Changed"
    val out2 = resolve(co, Seq(
      Ev("L1", 9500, 1, id = 2, BRANDCODE = "B7", UPTIME = 1),
      Ev("L1", 11000, 1, id = 3, BRANDCODE = "B7", UPTIME = 1)))
    val r2 = out2.collect().head
    assert(r2.getAs[String]("Next_BRANDCODE") == "B7")
    assert(r2.getAs[String]("Brandcode_Status") == "Not Changed")
  }

  test("empty next-window leaves Next_BRANDCODE empty") {
    val out = resolve(
      Seq(Ev("L1", 10000, 10, id = 100, BRANDCODE = "BC", UPTIME = 2)), Nil)
    assert(out.collect().head.getAs[String]("Next_BRANDCODE") == "")
  }

  test("next-window of CO i is capped by CO i+1's start") {
    val twoCos = Seq(
      Ev("L1", 10000, 10, id = 100, BRANDCODE = "BC"),
      Ev("L1", 50000, 10, id = 200, BRANDCODE = "BD")) // separate CO
    val out = resolve(twoCos, Seq(
      // uptime-start 52000-60=51940: after CO 2's start (50000), inside
      // its 60-min-padded last-CO bound — belongs to CO 2's window only
      Ev("L1", 52000, 1, id = 3, BRANDCODE = "B9", UPTIME = 1)))
    val m = byKey(out, "CO_Identifier", "Next_BRANDCODE")
    assert(m("L1 - 1970-01-01 - 100") == "") // nothing in window 1
    assert(m("L1 - 1970-01-01 - 200") == "B9")
  }

  test("first stop: cumulative uptime, planned/idle/excluded skipped") {
    val coAgg = CoAggregate(Sessionize(dtLog(co: _*), P))
    val full = dtLog(co ++ Seq(
      Ev("L1", 11000, 2, id = 11, UPTIME = 5, planned = 1),
      Ev("L1", 12000, 2, id = 12, UPTIME = 7, idle = 1),
      Ev("L1", 13000, 2, id = 13, UPTIME = 11, excluded = true),
      Ev("L1", 14000, 2, id = 14, UPTIME = 13),
      Ev("L1", 15000, 2, id = 15, UPTIME = 17)): _*)
    val fs = FirstStopAfterCo.firstStops(coAgg, full).collect()
    assert(fs.length == 1)
    val r = fs.head
    assert(r.getAs[String]("downtime_id") == "14")
    // cumul over ALL window events up to the pick: 5+7+11+13
    assert(r.getAs[Double]("Uptime_cumul") == 36.0)

    val tot = FirstStopAfterCo.uptimeTillNextCo(coAgg, full).collect().head
    // sum over ALL window events incl. planned/idle/excluded + no next CO
    assert(tot.getAs[Double]("Total_Uptime_till_Next_CO") == 53.0)
  }

  test("uptime till next CO adds the next CO's first-event uptime") {
    val twoCos = Seq(
      Ev("L1", 10000, 10, id = 100, BRANDCODE = "BC"),
      Ev("L1", 50000, 10, id = 200, BRANDCODE = "BD", UPTIME = 4))
    val coAgg = CoAggregate(Sessionize(dtLog(twoCos: _*), P))
    val full = dtLog(twoCos :+ Ev("L1", 20000, 2, id = 11, UPTIME = 5): _*)
    val tot = byKey(FirstStopAfterCo.uptimeTillNextCo(coAgg, full),
      "CO_Identifier", "Total_Uptime_till_Next_CO")
    // window events uptime (5) + next CO first event uptime (4)
    assert(tot("L1 - 1970-01-01 - 100") == 9.0)
    // last CO: 30-day window, no next -> 0
    assert(tot("L1 - 1970-01-01 - 200") == 0.0)
  }

  test("events inside a CO belong to no first-stop window") {
    val coEvs = Seq(
      Ev("L1", 10000, 10, id = 100),
      Ev("L1", 10900, 10, id = 101)) // same CO (gap < 2P/3)
    val coAgg = CoAggregate(Sessionize(dtLog(coEvs: _*), P))
    // event at 10650: after CO start, before CO end (11500) -> dropped
    val full = dtLog(coEvs :+ Ev("L1", 10650, 1, id = 11, UPTIME = 5): _*)
    assert(FirstStopAfterCo.firstStops(coAgg, full).collect().isEmpty)
  }
}
