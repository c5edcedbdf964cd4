package graft

import java.time.LocalDateTime

import graft.sources.ConfigOps

class ConfigOpsSpec extends GraftSuite {
  import spark.implicits._

  test("stripPrefix removes only the matching prefix") {
    val df = Seq((1, "x")).toDF("fields.Id", "Title")
    assert(ConfigOps.stripPrefix(df, "fields.").columns.toSeq ==
      Seq("Id", "Title"))
  }

  test("renameIfPresent renames drifted columns, ignores absent ones") {
    val df = Seq((1, "m")).toDF("id", "PUDesc")
    val out = ConfigOps.renameIfPresent(df,
      Map("PUDesc" -> "MACHINE", "PLC_CODE" -> "Fault"))
    assert(out.columns.toSeq == Seq("id", "MACHINE"))
  }

  test("lookback window follows the hour-of-day rule") {
    assert(ConfigOps.lookbackDays(3) == 7)
    assert(ConfigOps.lookbackDays(20) == 2)
    assert(ConfigOps.lookbackDays(21) == 14)
    assert(ConfigOps.lookbackDays(22) == 7)
    assert(ConfigOps.lookbackDays(12) == 3)
    val wm = LocalDateTime.of(2026, 8, 10, 6, 0)
    val now = LocalDateTime.of(2026, 8, 12, 21, 5)
    val (lo, hi) = ConfigOps.analysisWindow(wm, now)
    assert(lo == wm.minusDays(14))
    assert(hi == now.plusDays(1))
  }
}
