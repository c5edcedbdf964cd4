package graft

import scala.collection.mutable.ArrayBuffer

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{CoAggregate, GanttGenerate, Sessionize}

/** Differential test for the Gantt point kernel: an independent
  * single-threaded transcription of the reference loops
  * (`ref/RCO_subETL_Gantt_Data_generator.R:41-199`) — with this repo's
  * two documented deterministic deviations (total event order, W11
  * guard on original in-group times) — must produce exactly the
  * operator's points on random logs. Uses the non-constraint pass
  * (status 2/3); the constraint pass shares the same kernel with a
  * different status expression. */
class GanttPropertySpec extends GraftSuite {

  private val P = Sessionize.Params(triggerParam = 30.0)

  case class Pt(co: String, line: String, machine: String, t: Double,
      s: Double, pk: String, seq: Long)

  /** Straight-line transcription: per (CO, machine) window, walk the
    * ordered stops and emit points exactly as the R loops do. */
  private def reference(cos: Seq[(String, String, Double, Double)],
      evs: Seq[Ev]): Seq[Pt] = {
    val out = ArrayBuffer.empty[Pt]
    for ((coId, line, coStart, coEnd) <- cos) {
      val minT = coStart - GanttGenerate.MinutesBefore * 60
      val maxT = coEnd + GanttGenerate.MinutesAfter * 60
      val window = evs.filter(e => e.LINE == line &&
        e.start + e.DOWNTIME * 60 > minT && e.start < maxT)
      for (machine <- window.map(_.MACHINE).distinct) {
        val stops = window.filter(_.MACHINE == machine)
          .sortBy(e => (e.start, e.id))
        val pts = ArrayBuffer.empty[Pt]
        def emit(t: Double, s: Double, pk: String, seq: Long): Unit =
          pts += Pt(coId, line, machine, t, s, pk, seq)
        val e1 = stops.head
        val s1 = e1.start.toDouble
        val end1 = s1 + e1.DOWNTIME * 60
        val dt1 = e1.DOWNTIME * 60
        val prevUpEnd1 = s1 - e1.UPTIME * 60
        val caseA = minT < s1 && minT > prevUpEnd1
        if (caseA) {
          emit(minT, 3.0, e1.id.toString, 10)
          emit(s1 - 1, 3.0, e1.id.toString, 11)
          emit(s1, 2.0, e1.id.toString, 12)
          if (dt1 > 1) emit(end1, 2.0, e1.id.toString, 13)
        } else {
          emit(minT, 2.0, e1.id.toString, 10)
          if (dt1 > 1) emit(end1, 2.0, e1.id.toString, 13)
        }
        var lastTime = if (dt1 > 1) end1 else if (caseA) s1 else minT
        for ((e, idx) <- stops.zipWithIndex.drop(1)) {
          val rn = idx + 1
          val s = e.start.toDouble
          val end = s + e.DOWNTIME * 60
          if (e.UPTIME * 60 >= 2) {
            emit(lastTime + 1, 3.0, e.id.toString, rn * 10L)
            emit(s - 1, 3.0, e.id.toString, rn * 10L + 1)
          }
          if (e.DOWNTIME * 60 > 1) {
            emit(s, 2.0, e.id.toString, rn * 10L + 2)
            emit(end, 2.0, e.id.toString, rn * 10L + 3)
          }
          lastTime =
            if (e.DOWNTIME * 60 > 1) end
            else if (e.UPTIME * 60 >= 2) s - 1
            else lastTime
        }
        if (lastTime > maxT) {
          val i = pts.lastIndexWhere(_.t == lastTime)
          pts(i) = pts(i).copy(t = maxT)
        } else {
          emit(lastTime + 1, 3.0, "", (stops.size + 1) * 10L)
          emit(maxT, 3.0, "", (stops.size + 1) * 10L + 1)
        }
        out ++= pts
      }
    }
    // W11 (this repo's defined semantics): within (CO, machine) by seq,
    // guards on ORIGINAL times.
    out.groupBy(p => (p.co, p.machine)).values.flatMap { grp =>
      val g = grp.sortBy(_.seq).toIndexedSeq
      g.indices.map { i =>
        val p = g(i)
        if (i > 0 && i < g.size - 1 && p.t >= g(i + 1).t &&
          p.s != g(i + 1).s && p.t > g(i - 1).t + 1)
          p.copy(t = p.t - 1)
        else p
      }
    }.toSeq
  }

  private val genEv: Gen[Ev] = for {
    line <- Gen.oneOf("L1", "L2")
    start <- Gen.choose(0L, 12000L)
    dt <- Gen.oneOf(0.0, 0.01, 0.017, 1.0, 10.0, 30.0)
    up <- Gen.oneOf(0.0, 0.01, 0.034, 2.0, 20.0)
    mach <- Gen.oneOf(" M0", " M1")
  } yield Ev(line, start, dt, UPTIME = up, MACHINE = line + mach)

  private val genLog: Gen[Seq[Ev]] =
    Gen.listOfN(20, genEv).map { es =>
      es.groupBy(e => (e.LINE, e.start)).values.map(_.head).toSeq
        .sortBy(e => (e.LINE, e.start))
        .zipWithIndex.map { case (e, i) => e.copy(id = i + 1) }
    }

  // deeper sweeps: GRAFT_PROP_N=100 sbt "testOnly *PropertySpec"
  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "6").toInt

  test("points match the single-threaded reference transcription") {
    for (i <- 0 until nRuns) {
      val evs = genLog(Gen.Parameters.default, Seed(7L + i)).get
      val log = dtLog(evs: _*)
      // sessions from a CO-filtered subset: every 3rd event
      val coEvs = evs.filter(_.id % 3 == 0)
      if (coEvs.nonEmpty) {
        val coAgg = CoAggregate(Sessionize(dtLog(coEvs: _*), P))
        val cos = coAgg
          .select("CO_Identifier", "LINE", "CO_Start_EPOCH", "CO_End_EPOCH")
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
            r.getDouble(3))).toSeq
        val expected = reference(cos, evs)
          .map(p => (p.co, p.machine, p.seq) -> ((p.t, p.s, p.pk))).toMap
        val got = GanttGenerate
          .corrected(GanttGenerate.points(
            GanttGenerate.assign(coAgg, log),
            org.apache.spark.sql.functions.lit(2.0)))
          .collect()
          .map(r => (r.getAs[String]("CO_Identifier"),
            r.getAs[String]("Machine"), r.getAs[Long]("seq")) ->
            ((r.getAs[Double]("StartTime"),
              r.getAs[Double]("Downtime_Status"),
              r.getAs[String]("downtime_id"))))
          .toMap
        assert(got == expected, s"seed=${7 + i}")
      }
    }
  }

  test("bucketed assign ≡ naive per-LINE range join across bucket edges") {
    import spark.implicits._
    val W = GanttGenerate.BucketSeconds.toDouble
    for (i <- 0 until math.max(nRuns, 10)) {
      val rnd = new scala.util.Random(900 + i)
      // CO windows: sub-minute up to 3-bucket spans, some edge-aligned
      val cos = (0 until 8).map { j =>
        val line = "L" + (1 + rnd.nextInt(2))
        val s0 = rnd.nextDouble() * 5 * W
        val s = if (rnd.nextInt(4) == 0) math.floor(s0 / W) * W else s0
        val dur = rnd.nextInt(4) match {
          case 0 => 0.0
          case 1 => rnd.nextDouble() * 60
          case 2 => rnd.nextDouble() * W
          case _ => rnd.nextDouble() * 3 * W
        }
        (s"CO$j", line, s, s + dur)
      }
      // events: zero-width up to ~2-bucket spans, some edge-aligned
      val evs = (0 until 60).map { j =>
        val line = "L" + (1 + rnd.nextInt(2))
        val s0 = rnd.nextDouble() * 5 * W
        val s = if (rnd.nextInt(4) == 0) math.floor(s0 / W) * W else s0
        val dtMin = rnd.nextInt(3) match {
          case 0 => 0.0
          case 1 => rnd.nextDouble()
          case _ => rnd.nextDouble() * 2 * W / 60
        }
        (j.toLong, line, s, s + dtMin * 60)
      }
      val coAgg = cos.toDF("CO_Identifier", "LINE", "CO_Start_EPOCH",
        "CO_End_EPOCH")
      val stops = evs.toDF("dtid", "LINE", "START_EPOCH", "END_EPOCH")
      val got = GanttGenerate.assign(coAgg, stops)
        .select("CO_Identifier", "dtid").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val expected = for {
        (co, cl, cs, ce) <- cos
        minT = cs - GanttGenerate.MinutesBefore * 60
        maxT = ce + GanttGenerate.MinutesAfter * 60
        (id, el, es, ee) <- evs
        if el == cl && ee > minT && es < maxT
      } yield (co, id)
      // compare as multisets: replication must introduce NO duplicates
      assert(got.sorted == expected.sorted, s"seed=${900 + i}")
    }
  }
}
