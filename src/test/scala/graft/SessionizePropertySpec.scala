package graft

import java.time.{Instant, ZoneOffset}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Sessionize

/** Differential test: the Spark window-function sessionizer vs an
  * independent single-threaded transcription of `ref/RCO_MES_ETL.R:
  * 100-147`. Random (fixed-seed) event logs, all override combinations. */
class SessionizePropertySpec extends GraftSuite {

  /** Straight-line reference implementation (per line, ordered scan). */
  private def reference(evs: Seq[Ev], p: Sessionize.Params)
      : Map[String, (Int, String)] = {
    def tc(e: Ev) = s"${e.c1} - ${e.c2} - ${e.c3}"
    def dateOf(sec: Long) =
      Instant.ofEpochSecond(sec).atZone(ZoneOffset.UTC).toLocalDate.toString
    evs.groupBy(_.LINE).flatMap { case (line, es) =>
      var prev: Option[Ev] = None
      var curId = ""
      es.sortBy(e => (e.start, e.id)).map { e =>
        val trig = prev match {
          case None => 1
          case Some(q) =>
            val gap = (e.start - (q.start + q.DOWNTIME * 60)) / 60.0
            val sameTrig = tc(e) == tc(q)
            val sameBrand = e.BRANDCODE == q.BRANDCODE
            val pr = p.triggerParam
            val f4 = if (p.pythonFactor4) pr * 3 / 2 else pr / 3 * 2
            val sameCo = (gap < pr && sameTrig) ||
              (gap < pr * 4 / 3 && sameTrig && sameBrand) ||
              (gap < pr && sameBrand) ||
              (gap < f4)
            val base = if (sameCo) 0 else 1
            val afterSplit =
              if (p.splitOnCause && !sameTrig) 1 else base
            if (p.changeoverFailureNoSplit && afterSplit == 1 &&
              tc(e).contains("Changeover Failure") && gap < 120) 0
            else afterSplit
        }
        if (trig == 1)
          curId = s"$line - ${dateOf(e.start)} - ${e.id.toString.take(10)}"
        prev = Some(e)
        e.id.toString -> ((trig, curId))
      }
    }
  }

  private val genEv: Gen[Ev] = for {
    line <- Gen.oneOf("L1", "L2")
    start <- Gen.choose(0L, 20000L)
    dt <- Gen.oneOf(0.0, 0.5, 5.0, 25.0, 60.0)
    c2 <- Gen.oneOf("CO", "Changeover Failure")
    brand <- Gen.oneOf("B1", "B2")
  } yield Ev(line, start, dt, c2 = c2, BRANDCODE = brand)

  private val genLog: Gen[Seq[Ev]] =
    Gen.listOfN(25, genEv).map { es =>
      // operator input contract: deduped on (LINE, start); ids unique
      es.groupBy(e => (e.LINE, e.start)).values.map(_.head).toSeq
        .sortBy(e => (e.LINE, e.start))
        .zipWithIndex.map { case (e, i) => e.copy(id = i + 1) }
    }

  private val paramVariants = Seq(
    Sessionize.Params(30.0),
    Sessionize.Params(30.0, splitOnCause = true),
    Sessionize.Params(30.0, changeoverFailureNoSplit = true),
    Sessionize.Params(30.0, splitOnCause = true,
      changeoverFailureNoSplit = true),
    Sessionize.Params(30.0, pythonFactor4 = true),
    Sessionize.Params(30.0, splitOnCause = true, pythonFactor4 = true))

  // deeper sweeps: GRAFT_PROP_N=100 sbt "testOnly *PropertySpec"
  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "8").toInt

  test("matches the single-threaded reference on random logs") {
    for (i <- 0 until nRuns) {
      val evs = genLog(Gen.Parameters.default, Seed(42L + i)).get
      assert(evs.nonEmpty)
      for (p <- paramVariants) {
        val expected = reference(evs, p)
        val got = Sessionize(dtLog(evs: _*), p)
          .select("downtime_id", "CO_Trigger", "CO_Identifier")
          .collect()
          .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2))))
          .toMap
        assert(got == expected, s"seed=${42 + i} params=$p events=$evs")
      }
    }
  }
}
