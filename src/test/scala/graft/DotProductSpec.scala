package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** The native expression must be bit-identical to the composable
  * zip_with+aggregate fold it replaces, in both eval modes. */
class DotProductSpec extends GraftSuite {
  import spark.implicits._

  private def nativeDot = call_function("graft_dot", col("a"), col("b"))

  private def foldDot =
    aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
      (acc, v) => acc + v)

  private val vecs = Seq(
    (Array(1.5, -2.25, 3.0, 0.1), Array(0.7, 0.3, -1.1, 2.0)),
    (Array(0.0, 0.0), Array(1.0, -0.0)),
    (Array(1e-300, 1e300, -1e300), Array(1e300, 1.0, 1.0)),
    (Array.empty[Double], Array.empty[Double]))
    .toDF("a", "b")

  test("matches the zip_with/aggregate fold bit-for-bit") {
    val rows = vecs.select(nativeDot.as("n"), foldDot.as("f")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval matches the loop semantics") {
    val e = DotProduct(
      Literal.create(Array(1.5, 2.5), ArrayType(DoubleType)),
      Literal.create(Array(2.0, -1.0), ArrayType(DoubleType)))
    assert(e.eval(null) == 0.5)
  }

  test("resolves in SQL text via the session extension") {
    val r = vecs.selectExpr("graft_dot(a, b) AS d").collect().head
    assert(r.getDouble(0) == 1.5 * 0.7 + -2.25 * 0.3 + 3.0 * -1.1 + 0.1 * 2.0)
  }

  test("mismatched lengths and null elements match the fold: NULL") {
    // zip_with pads the shorter array with null → null product → null
    // sum; a null element does the same. The native expression must
    // agree rather than truncate / read undefined slots.
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 5.0)))
      .toDF("a", "b")
    val rows = df.select(nativeDot.as("n"), foldDot.as("f")).collect()
    rows.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("null inputs yield null; type mismatch is rejected") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(nativeDot).collect().head.isNullAt(0))
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(nativeDot).collect()
    }
  }
}
