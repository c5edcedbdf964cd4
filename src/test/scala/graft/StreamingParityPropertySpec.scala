package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{BrandcodeResolve, CoAggregate, FirstStopAfterCo, GanttGenerate, Sessionize}
import graft.streaming.{StreamingBrandcode, StreamingFirstStop, StreamingGantt}

/** Randomized differential sweep for the fused streaming twins: on
  * random CANONICAL logs (unique (LINE, t) per D1, UPTIME derived as
  * the clamped gap to the previous event's end — the invariant the
  * streaming window-close bounds rely on), the streaming folds must
  * reproduce the batch operators exactly, minus each line's final
  * still-open CO.
  *
  * The folds run here in BATCH mode (`flatMapGroupsWithState` over a
  * batch Dataset processes each group's full iterator with empty
  * state — the same code path); cross-micro-batch state is covered by
  * the handcrafted StreamingFirstStopSpec / StreamingBrandcodeSpec. */
class StreamingParityPropertySpec extends GraftSuite {
  import spark.implicits._

  private val P = Sessionize.Params(triggerParam = 30.0)
  // gaps straddle every trigger threshold (P=30 min: 1200/1800/2400 s)
  private val gaps = Seq(30L, 600L, 1100L, 1500L, 2000L, 3000L, 20000L)
  private val downs = Seq(0.0, 0.01, 1.0, 10.0, 40.0)

  private def genLog(seed: Int): Seq[Ev] = {
    val rnd = new Random(seed)
    (1 to 2).flatMap { l =>
      var t = 500L + rnd.nextInt(1000)
      var prevEnd = Double.NaN
      var id = l * 1000
      (0 until 25).map { _ =>
        val dt = downs(rnd.nextInt(downs.size))
        val up = if (prevEnd.isNaN) 0.0
          else math.max(0.0, (t - prevEnd) / 60.0)
        val e = Ev(s"L$l", t, dt,
          c1 = if (rnd.nextInt(10) < 4) "co" else "x",
          c2 = s"k${rnd.nextInt(2)}",
          BRANDCODE = s"B${rnd.nextInt(2)}",
          id = { id += 1; id },
          // half the events on the line's constraint machine — the
          // gantt parity sweep needs both G2 passes populated
          MACHINE = s"L$l M${rnd.nextInt(2)}",
          UPTIME = up,
          planned = if (rnd.nextInt(5) == 0) 1 else 0,
          idle = if (rnd.nextInt(5) == 0) 1 else 0,
          excluded = rnd.nextInt(6) == 0)
        prevEnd = t + dt * 60
        t += gaps(rnd.nextInt(gaps.size))
        e
      }
    }
  }

  private def openIds(agg: org.apache.spark.sql.DataFrame): Set[String] = {
    val w = Window.partitionBy("LINE").orderBy(col("CO_Start_EPOCH").desc)
    agg.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("CO_Identifier").collect().map(_.getString(0)).toSet
  }

  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "6").toInt

  test("streaming first-stop ≡ batch on random canonical logs") {
    for (i <- 0 until nRuns) {
      val evs = genLog(40 + i)
      val dt = dtLog(evs: _*)
      val agg = CoAggregate(Sessionize(
        dt.filter(col("CAUSE_LEVELS_1_NAME") === "co"), P))
      val open = openIds(agg)
      val fs = FirstStopAfterCo.firstStops(agg, dt).collect()
        .map(r => r.getAs[String]("CO_Identifier") ->
          ((r.getAs[String]("downtime_id"), r.getAs[Double]("DOWNTIME"),
            r.getAs[Double]("UPTIME"),
            r.getAs[Double]("Uptime_cumul")))).toMap
      val up = FirstStopAfterCo.uptimeTillNextCo(agg, dt).collect()
        .map(r => r.getAs[String]("CO_Identifier") ->
          r.getAs[Double]("Total_Uptime_till_Next_CO")).toMap
      val expected = up.keySet.filterNot(open).map { id =>
        val f = fs.get(id)
        (id, up(id), f.map(_._1), f.map(_._2), f.map(_._3), f.map(_._4))
      }
      val got = StreamingFirstStop(
        evs.map(e => StreamingFirstStop.EvFs(e.LINE, e.id.toString, e.id,
          e.start.toDouble, e.start.toDouble + e.DOWNTIME * 60,
          e.DOWNTIME, e.UPTIME, s"${e.c1} - ${e.c2} - ${e.c3}",
          e.BRANDCODE, e.c1 == "co", e.planned, e.idle, e.excluded)).toDS(),
        P).collect()
        .map(o => (o.CO_Identifier, o.Total_Uptime_till_Next_CO,
          o.first_downtime_id, o.first_DOWNTIME, o.first_UPTIME,
          o.Uptime_cumul)).toSet
      assert(got == expected, s"seed=${40 + i}")
    }
  }

  test("streaming gantt ≡ batch on random logs with OVERLAPPING windows") {
    // the short random gaps put the next CO well inside the previous
    // CO's [start−5min, end+15min] plot window — the overlap case the
    // handcrafted StreamingGanttSpec does not reach
    for (i <- 0 until nRuns) {
      val evs = genLog(120 + i)
      val dt = dtLog(evs: _*)
      val ses = Sessionize(
        dt.filter(col("CAUSE_LEVELS_1_NAME") === "co"), P)
      val agg = CoAggregate(ses)
      val open = openIds(agg)
      // a closed CO's points emit once any event STARTS at/past its
      // window end; with per-line ordered replay that is: the line's
      // last event start reaches max_t
      val lastStart = evs.groupBy(_.LINE).view
        .mapValues(_.map(_.start).max.toDouble).toMap
      val flushed = agg.select("CO_Identifier", "LINE", "CO_End_EPOCH")
        .collect()
        .filter(r => !open.contains(r.getString(0)) &&
          lastStart(r.getString(1)) >=
            r.getDouble(2) + GanttGenerate.MinutesAfter * 60)
        .map(_.getString(0)).toSet
      val consLog = GanttGenerate.constraintLog(dt, ses, Seq("M0"))
      def pts(df: org.apache.spark.sql.DataFrame) =
        df.select(col("CO_Identifier"), col("Line"), col("Machine"),
          col("seq"), col("StartTime"), col("Downtime_Status"),
          col("downtime_id")).collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getLong(3), r.getDouble(4), r.getDouble(5), r.getString(6)))
          .toSet
      val expected = pts(GanttGenerate.ganttData(agg, dt, consLog)
        .filter(col("CO_Identifier").isin(flushed.toSeq: _*)))
      val assigned = StreamingGantt(
        evs.map(e => StreamingGantt.GEv(e.LINE, e.MACHINE, e.id.toString,
          e.id, e.start.toDouble, e.start.toDouble + e.DOWNTIME * 60,
          e.DOWNTIME, e.UPTIME, s"${e.c1} - ${e.c2} - ${e.c3}",
          e.BRANDCODE, e.c1 == "co",
          isConstraint = e.MACHINE == e.LINE + " M0",
          coEvent = e.c1 == "co", planned = e.planned,
          idle = e.idle)).toDS(), P)
      val gotCos = assigned.select("CO_Identifier").distinct()
        .as[String].collect().toSet
      assert(gotCos == flushed, s"seed=${120 + i}: closed-CO set")
      val got = pts(StreamingGantt.points(assigned.toDF()))
      assert(got == expected, s"seed=${120 + i}")
    }
  }

  test("streaming brandcode ≡ batch on random canonical logs") {
    for (i <- 0 until nRuns) {
      val evs = genLog(80 + i)
      val dt = dtLog(evs: _*)
      val agg = CoAggregate(Sessionize(
        dt.filter(col("CAUSE_LEVELS_1_NAME") === "co"), P))
      val open = openIds(agg)
      val expected = BrandcodeResolve(agg, dt).collect()
        .map(r => (r.getAs[String]("CO_Identifier"),
          r.getAs[String]("Current_BRANDCODE"),
          r.getAs[String]("Next_BRANDCODE"),
          r.getAs[String]("Brandcode_Status")))
        .filterNot(t => open.contains(t._1)).toSet
      val got = StreamingBrandcode(
        evs.map(e => StreamingBrandcode.EvB(e.LINE, e.id.toString, e.id,
          e.start.toDouble, e.start.toDouble + e.DOWNTIME * 60,
          s"${e.c1} - ${e.c2} - ${e.c3}", e.BRANDCODE, e.UPTIME,
          e.c1 == "co")).toDS(), P).collect()
        .map(o => (o.CO_Identifier, o.Current_BRANDCODE,
          o.Next_BRANDCODE, o.Brandcode_Status)).toSet
      assert(got == expected, s"seed=${80 + i}")
    }
  }
}
