package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gini rank formulation invariants on analytic fixtures. */
class GiniSpec extends GraftSuite {
  import spark.implicits._

  private def gini(xs: Seq[Double]): Double = {
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x")
    val w = Window.orderBy(col("x"), col("id"))
    df.withColumn("i", row_number().over(w).cast("double"))
      .agg(round(lit(2.0) * sum(col("i") * col("x")) /
        (count(lit(1)) * sum(col("x"))) -
        (count(lit(1)) + lit(1.0)) / count(lit(1)), 6))
      .as[Double].collect().head
  }

  test("perfect equality scores zero") {
    assert(gini(Seq.fill(10)(7.5)) == 0.0)
  }

  test("total concentration approaches (n-1)/n") {
    val g = gini(Seq.fill(9)(0.0) :+ 100.0)
    assert(math.abs(g - 0.9) < 1e-9)
  }

  test("more concentration -> higher index; permutation-invariant") {
    val spread = gini(Seq(10.0, 11.0, 9.0, 10.0))
    val skewed = gini(Seq(1.0, 1.0, 1.0, 37.0))
    assert(skewed > spread)
    assert(gini(Seq(3.0, 1.0, 2.0)) == gini(Seq(1.0, 2.0, 3.0)))
  }
}
