package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** [[Drift]] contract: hand-computed smoothed PSI/KL terms, one-side-
  * only and NULL cells, numeric edge bins. */
class DriftSpec extends GraftSuite {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("categorical: hand-computed terms incl. new and null cells") {
    val before = Seq("a", "a", "a", "b", null).toDF("c")
    val after = Seq("a", "b", "b", "b").toDF("c")
    val out = Drift.categorical(before, after, "c")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // cells: a(3,1) b(1,3) __null(1,0); V=3, tb=5, ta=4
    def p(n: Long) = (n + 0.5) / (5.0 + 0.5 * 3)
    def q(n: Long) = (n + 0.5) / (4.0 + 0.5 * 3)
    def psi(nb: Long, na: Long) =
      r6((p(nb) - q(na)) * math.log(p(nb) / q(na)))
    def kl(nb: Long, na: Long) = r6(p(nb) * math.log(p(nb) / q(na)))
    assert(out("a") == (("a", 3L, 1L, psi(3, 1), kl(3, 1))))
    assert(out("b") == (("b", 1L, 3L, psi(1, 3), kl(1, 3))))
    assert(out("__null") == (("__null", 1L, 0L, psi(1, 0), kl(1, 0))))
  }

  test("identical distributions drift to ~zero") {
    val df = Seq("x", "y", "y", "z").toDF("c")
    val out = Drift.categorical(df, df, "c")
      .agg(sum(col("psi_term")), sum(col("kl_term")))
      .as[(Double, Double)].collect().head
    assert(math.abs(out._1) < 1e-9 && math.abs(out._2) < 1e-9)
  }

  test("numeric: underflow/overflow land in edge bins, NULL in __null") {
    val before = Seq[Option[Double]](Some(-5.0), Some(0.0), Some(9.9),
      Some(10.0), Some(25.0), None).toDF("v")
    val after = Seq[Option[Double]](Some(5.0), Some(15.0)).toDF("v")
    val cells = Drift.numeric(before, after, "v", 0.0, 20.0, 2)
      .select("value", "n_before", "n_after")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cells("-1") == ((1L, 0L)), "underflow bin")
    assert(cells("2") == ((1L, 0L)), "overflow bin")
    assert(cells("0") == ((2L, 1L)))
    assert(cells("1") == ((1L, 1L)), "10.0 lands in [10,20)")
    assert(cells("__null") == ((1L, 0L)))
  }
}
