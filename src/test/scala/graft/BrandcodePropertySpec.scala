package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.BrandcodeResolve

/** Differential test: the Spark merged-stream as-of reformulation vs an
  * independent single-threaded transcription of the reference's per-CO
  * brandcode loops (`ref/RCO_MES_ETL.R:179-227`). Random (fixed-seed)
  * logs drawn from a SMALL time range so the boundary cases collide
  * often: event exactly at a CO start, zero-uptime boundary events,
  * empty windows, overlapping CO ends, uptime-start exactly at the
  * next CO's start. */
class BrandcodePropertySpec extends GraftSuite {

  private case class Co(id: String, line: String, start: Long, end: Long)

  /** Straight-line reference implementation (per line, per CO). */
  private def reference(cos: Seq[Co], evs: Seq[Ev])
      : Map[String, (String, String, String)] =
    cos.groupBy(_.line).flatMap { case (line, cs) =>
      val sorted = cs.sortBy(_.start)
      val es = evs.filter(_.LINE == line)
      def key(e: Ev) = (e.start, e.id)
      sorted.zipWithIndex.map { case (c, i) =>
        val prevEnd =
          if (i == 0) c.start - 3600 else sorted(i - 1).end
        val nextStart =
          if (i == sorted.size - 1) c.end + 3600 else sorted(i + 1).start
        val win = es.filter(e => e.start > prevEnd && e.start <= c.start)
        val preferred = win.filter(e => e.start - e.UPTIME * 60 < c.start)
        val cur =
          if (win.isEmpty) ""
          else if (preferred.nonEmpty) preferred.maxBy(key).BRANDCODE
          else win.maxBy(key).BRANDCODE
        val nwin = es.filter { e =>
          val us = e.start - e.UPTIME * 60
          us > c.start && us < nextStart
        }
        val next =
          if (nwin.isEmpty) ""
          else nwin.sortBy(key).find(_.BRANDCODE != cur)
            .map(_.BRANDCODE).getOrElse(cur)
        val status = if (cur == next) "Not Changed" else "OK"
        c.id -> ((cur, next, status))
      }
    }

  private val genEv: Gen[Ev] = for {
    line <- Gen.oneOf("L1", "L2")
    start <- Gen.choose(0L, 400L).map(_ * 30) // coarse grid → collisions
    up <- Gen.oneOf(0.0, 0.0, 1.0, 30.0, 120.0)
    brand <- Gen.oneOf("B1", "B2", "B3")
  } yield Ev(line, start, 0.5, BRANDCODE = brand, UPTIME = up)

  private val genLog: Gen[Seq[Ev]] =
    Gen.listOfN(30, genEv).map { es =>
      es.groupBy(e => (e.LINE, e.start)).values.map(_.head).toSeq
        .sortBy(e => (e.LINE, e.start))
        .zipWithIndex.map { case (e, i) => e.copy(id = i + 1) }
    }

  private val genCos: Gen[Seq[Co]] = Gen.listOfN(8, for {
    line <- Gen.oneOf("L1", "L2")
    start <- Gen.choose(0L, 400L).map(_ * 30)
    dur <- Gen.oneOf(60L, 600L, 3600L, 7200L) // long ⇒ overlapping ends
  } yield Co("", line, start, start + dur)).map { cs =>
    cs.groupBy(c => (c.line, c.start)).values.map(_.head).toSeq
      .sortBy(c => (c.line, c.start))
      .zipWithIndex.map { case (c, i) => c.copy(id = s"CO$i") }
  }

  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "10").toInt

  test("matches the single-threaded reference on random logs") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val seed = Seed(1000L + i)
      val evs = genLog(Gen.Parameters.default, seed).get
      val cos = genCos(Gen.Parameters.default, seed.next).get
      if (cos.nonEmpty) {
        val coAgg = cos.map(c => (c.id, c.line, c.start, c.end))
          .toDF("id", "line", "start", "end")
          .select(col("id").as("CO_Identifier"), col("line").as("LINE"),
            timestamp_seconds(col("start")).as("CO_StartTime"),
            col("start").cast("double").as("CO_Start_EPOCH"),
            col("end").cast("double").as("CO_End_EPOCH"))
        val got = BrandcodeResolve(coAgg, dtLog(evs: _*))
          .select("CO_Identifier", "Current_BRANDCODE", "Next_BRANDCODE",
            "Brandcode_Status")
          .collect()
          .map(r => r.getString(0) ->
            ((r.getString(1), r.getString(2), r.getString(3))))
          .toMap
        val expected = reference(cos, evs)
        assert(got == expected,
          s"seed=${1000 + i}\ncos=$cos\nevents=$evs")
      }
    }
  }
}
