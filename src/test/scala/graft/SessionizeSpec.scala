package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** Golden edge cases for the 4-disjunct trigger, the overrides and the
  * id forward-fill (`ref/RCO_MES_ETL.R:107-147`). Trigger parameter P=30
  * throughout; event DOWNTIME=10 min so end = start + 600s. */
class SessionizeSpec extends GraftSuite {

  private val P = Sessionize.Params(triggerParam = 30.0)

  private def triggers(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    byKey(df, "downtime_id", "CO_Trigger")
      .map { case (k, v) => k -> v.asInstanceOf[Int] }

  test("first event per line always starts a session") {
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1),
      Ev("L2", 1000, 10, id = 2)), P)
    assert(triggers(out) == Map("1" -> 1, "2" -> 1))
  }

  test("disjunct 1: gap < P with same cause trio joins the session") {
    // end(1) = 1600; start(2) = 1600 + 20 min => gap 20 < 30, same trio
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, BRANDCODE = "B1"),
      Ev("L1", 2800, 10, id = 2, BRANDCODE = "B2")), P)
    assert(triggers(out)("2") == 0)
  }

  test("disjunct 2: gap in [P, 4P/3) needs same trio AND same brandcode") {
    // gap 35 min: same trio + same brand -> joined
    val joined = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1),
      Ev("L1", 1600 + 35 * 60, 10, id = 2)), P)
    assert(triggers(joined)("2") == 0)
    // gap 35 min: same trio, DIFFERENT brand -> new session
    val split = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, BRANDCODE = "B1"),
      Ev("L1", 1600 + 35 * 60, 10, id = 2, BRANDCODE = "B2")), P)
    assert(triggers(split)("2") == 1)
  }

  test("disjunct 3: gap < P with same brandcode only joins") {
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, c2 = "x"),
      Ev("L1", 2800, 10, id = 2, c2 = "y")), P)
    assert(triggers(out)("2") == 0) // same brand B0, gap 20 < 30
  }

  test("disjunct 4 uses the R-authoritative 2/3 factor, not Python's 3/2") {
    // different trio AND brand: only disjunct 4 can join; bound = 20 min
    def gapCase(gapMin: Int, expected: Int) = {
      val out = Sessionize(dtLog(
        Ev("L1", 1000, 10, id = 1, c1 = "a", BRANDCODE = "B1"),
        Ev("L1", 1600 + gapMin * 60, 10, id = 2, c1 = "b",
          BRANDCODE = "B2")), P)
      assert(triggers(out)("2") == expected,
        s"gap=$gapMin min should give trigger=$expected")
    }
    gapCase(19, 0) // < 2P/3 = 20 -> same CO
    gapCase(21, 1) // in (2P/3, P): Python's 3P/2=45 bound would say 0
    gapCase(44, 1)
  }

  test("thresholds are strict: gaps exactly at 2P/3 and P split") {
    // gap exactly 20 min (= 2P/3), different trio+brand: disjunct 4
    // requires gap < 2P/3 strictly -> new session
    val atTwoThirds = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, c1 = "a", BRANDCODE = "B1"),
      Ev("L1", 1600 + 20 * 60, 10, id = 2, c1 = "b", BRANDCODE = "B2")), P)
    assert(triggers(atTwoThirds)("2") == 1)
    // gap exactly 30 min (= P), same trio+brand: disjuncts 1/3 strict,
    // but disjunct 2 (gap < 4P/3 with same trio AND brand) still joins
    val atP = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1),
      Ev("L1", 1600 + 30 * 60, 10, id = 2)), P)
    assert(triggers(atP)("2") == 0)
    // gap exactly P with same trio but different brand: all fail
    val atPDiffBrand = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, BRANDCODE = "B1"),
      Ev("L1", 1600 + 30 * 60, 10, id = 2, BRANDCODE = "B2")), P)
    assert(triggers(atPDiffBrand)("2") == 1)
  }

  test("negative gap (overlapping events) joins the session") {
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 60, id = 1, c1 = "a", BRANDCODE = "B1"),
      Ev("L1", 1500, 10, id = 2, c1 = "b", BRANDCODE = "B2")), P)
    assert(triggers(out)("2") == 0)
  }

  test("splitOnCause forces a split on any cause-trio change") {
    val p = Sessionize.Params(triggerParam = 30.0, splitOnCause = true)
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, c3 = "x"),
      Ev("L1", 1700, 10, id = 2, c3 = "y")), p) // gap ~2 min
    assert(triggers(out)("2") == 1)
    // identical trio still joins
    val same = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1),
      Ev("L1", 1700, 10, id = 2)), p)
    assert(triggers(same)("2") == 0)
  }

  test("Changeover-Failure override suppresses splits under 120 min") {
    val p = Sessionize.Params(triggerParam = 30.0,
      changeoverFailureNoSplit = true)
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, c2 = "Changeover Failure", BRANDCODE = "B1"),
      Ev("L1", 1600 + 90 * 60, 10, id = 2, c2 = "Changeover Failure",
        BRANDCODE = "B2")), p) // gap 90: all disjuncts fail, override holds
    assert(triggers(out)("2") == 0)
    val far = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1, c2 = "Changeover Failure", BRANDCODE = "B1"),
      Ev("L1", 1600 + 130 * 60, 10, id = 2, c2 = "Changeover Failure",
        BRANDCODE = "B2")), p) // gap 130 > 120 -> split stands
    assert(triggers(far)("2") == 1)
  }

  test("lines sessionize independently and ids forward-fill within line") {
    val out = Sessionize(dtLog(
      Ev("L1", 1000, 10, id = 1),
      Ev("L1", 2800, 10, id = 2),   // joins CO of id 1
      Ev("L2", 2800, 10, id = 3)),  // own line -> own CO
      P)
    val ids = byKey(out, "downtime_id", "CO_Identifier")
      .map { case (k, v) => k -> v.toString }
    assert(ids("1") == ids("2"))
    assert(ids("3") != ids("1"))
    assert(ids("1") == "L1 - 1970-01-01 - 1")
    assert(ids("3") == "L2 - 1970-01-01 - 3")
  }
}
