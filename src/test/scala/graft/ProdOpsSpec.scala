package graft

import org.apache.spark.sql.functions._

import graft.operators.ProdOps

class ProdOpsSpec extends GraftSuite {
  import spark.implicits._

  test("runtime clamp and first-day trim") {
    val log = dtLog(
      Ev("L1", 0, 10, id = 1, UPTIME = 2000),      // day 0 (partial)
      Ev("L1", 90000, 10, id = 2, UPTIME = 1500),  // day 1, >1440
      Ev("L1", 180000, 10, id = 3, UPTIME = 100))  // day 2
    val plain = ProdOps.runtimePerDay(log)
    assert(plain.count() == 3)
    val shaped = ProdOps.runtimePerDay(log, clampDay = true,
      dropFirstDay = true)
    val rows = shaped.orderBy("Date").collect()
    assert(rows.length == 2) // first day trimmed
    assert(rows.head.getAs[Double]("Runtime") == 1440.0) // clamped
    assert(rows.last.getAs[Double]("Runtime") == 100.0)
  }

  test("adaptive rounding picks places from mean magnitude") {
    // means: big ≈ 7345 (≥100 → 1 place), mid ≈ 0.179 (<1 → 4 places),
    // small ≈ 0.0179 (<0.1 → 5 places) — reference thresholds
    val df = Seq((12345.6789, 0.123456789, 0.0123456789),
        (2345.678901, 0.234567891, 0.0234567891))
      .toDF("big", "mid", "small")
    val out = ProdOps.roundAdaptive(df, Seq("big", "mid", "small"))
      .orderBy("big").collect()
    assert(out.head.getAs[Double]("big") == 2345.7)    // 1 place
    assert(out.head.getAs[Double]("mid") == 0.2346)    // 4 places
    assert(out.head.getAs[Double]("small") == 0.02346) // 5 places
  }
}
