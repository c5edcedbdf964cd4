package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.FirstStopAfterCo

/** Differential test: the merged-stream first-stop assignment vs an
  * independent straight-line transcription of
  * `ref/RCO_subETL_First_Stop_after_CO.R:37-83` (R-authoritative
  * UPTIME accumulation, window [CO_end, next CO start), 30-day tail,
  * next-CO first-event uptime in the A9 total). Boundary-collision-rich
  * generators: events exactly at CO ends / next CO starts, empty and
  * overlapping windows, flag combinations. */
class FirstStopPropertySpec extends GraftSuite {

  private case class Co(id: String, line: String, start: Long, end: Long,
      firstUp: Double)

  /** (firstStop per CO: downtime_id + cumul, total per CO). */
  private def reference(cos: Seq[Co], evs: Seq[Ev])
      : (Map[String, (String, Double)], Map[String, Double]) = {
    val fs = Map.newBuilder[String, (String, Double)]
    val tot = Map.newBuilder[String, Double]
    def r2(d: Double) = BigDecimal(d).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    cos.groupBy(_.line).foreach { case (line, cs) =>
      val sorted = cs.sortBy(_.start)
      val es = evs.filter(_.LINE == line).sortBy(e => (e.start, e.id))
      sorted.zipWithIndex.foreach { case (c, i) =>
        val hi = if (i == sorted.size - 1) c.end + 30L * 86400
          else sorted(i + 1).start
        val win = es.filter(e => e.start >= c.end && e.start < hi)
        var cumul = 0.0
        var found = false
        win.foreach { e =>
          cumul += e.UPTIME
          if (!found && e.planned == 0 && e.idle == 0 && !e.excluded) {
            found = true
            fs += c.id -> ((e.id.toString, r2(cumul)))
          }
        }
        val nextUp =
          if (i == sorted.size - 1) 0.0 else sorted(i + 1).firstUp
        tot += c.id -> r2(win.map(_.UPTIME).sum + nextUp)
      }
    }
    (fs.result(), tot.result())
  }

  private val genEv: Gen[Ev] = for {
    line <- Gen.oneOf("L1", "L2")
    start <- Gen.choose(0L, 400L).map(_ * 30)
    up <- Gen.oneOf(0.0, 1.25, 30.0)
    planned <- Gen.frequency(3 -> 0, 1 -> 1)
    idle <- Gen.frequency(3 -> 0, 1 -> 1)
    excl <- Gen.frequency(4 -> false, 1 -> true)
  } yield Ev(line, start, 0.5, UPTIME = up, planned = planned,
    idle = idle, excluded = excl)

  private val genLog: Gen[Seq[Ev]] =
    Gen.listOfN(30, genEv).map { es =>
      es.groupBy(e => (e.LINE, e.start)).values.map(_.head).toSeq
        .sortBy(e => (e.LINE, e.start))
        .zipWithIndex.map { case (e, i) => e.copy(id = i + 1) }
    }

  private val genCos: Gen[Seq[Co]] = Gen.listOfN(8, for {
    line <- Gen.oneOf("L1", "L2")
    start <- Gen.choose(0L, 400L).map(_ * 30)
    dur <- Gen.oneOf(0L, 60L, 600L, 7200L) // 0 ⇒ end == start collisions
    firstUp <- Gen.oneOf(0.0, 2.5)
  } yield Co("", line, start, start + dur, firstUp)).map { cs =>
    cs.groupBy(c => (c.line, c.start)).values.map(_.head).toSeq
      .sortBy(c => (c.line, c.start))
      .zipWithIndex.map { case (c, i) => c.copy(id = s"CO$i") }
  }

  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "10").toInt

  test("matches the single-threaded reference on random logs") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val seed = Seed(7000L + i)
      val evs = genLog(Gen.Parameters.default, seed).get
      val cos = genCos(Gen.Parameters.default, seed.next).get
      if (cos.nonEmpty) {
        val coAgg = cos.map(c => (c.id, c.line, c.start, c.end, c.firstUp))
          .toDF("id", "line", "start", "end", "fu")
          .select(col("id").as("CO_Identifier"), col("line").as("LINE"),
            col("start").cast("double").as("CO_Start_EPOCH"),
            col("end").cast("double").as("CO_End_EPOCH"),
            col("fu").as("first_ev_UPTIME"))
        val log = dtLog(evs: _*)
        val (expFs, expTot) = reference(cos, evs)
        val gotFs = FirstStopAfterCo.firstStops(coAgg, log)
          .select("CO_Identifier", "downtime_id", "Uptime_cumul")
          .collect()
          .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2))))
          .toMap
        assert(gotFs == expFs, s"first-stop seed=${7000 + i}\ncos=$cos")
        val gotTot = FirstStopAfterCo.uptimeTillNextCo(coAgg, log)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
        assert(gotTot == expTot, s"totals seed=${7000 + i}\ncos=$cos")
      }
    }
  }
}
