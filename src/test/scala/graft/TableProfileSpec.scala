package graft

import org.apache.spark.sql.functions._

import graft.operators.TableProfile

/** Column-profile operator: exact cells, the all-NULL column edge, the
  * approx form's schema identity, and argument validation. */
class TableProfileSpec extends GraftSuite {
  import spark.implicits._

  private val df = Seq(
    (Option(1.0), Option(10L), Option.empty[Double]),
    (Option(2.0), Option(10L), Option.empty[Double]),
    (Option(2.0), Option.empty[Long], Option.empty[Double]),
    (Option.empty[Double], Option(30L), Option.empty[Double]))
    .toDF("a", "b", "nil")

  test("exact profile: counts, nulls, distinct, min/max per column") {
    val p = TableProfile.profile(df, Seq("a", "b", "nil"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(p == Set(
      ("a", 4L, 1L, 2L, Some(1.0), Some(2.0)),
      ("b", 4L, 1L, 2L, Some(10.0), Some(30.0)),
      // all-NULL column: zero distinct, NULL min/max, nulls == rows
      ("nil", 4L, 4L, 0L, None, None)))
  }

  test("approx profile: identical schema, exact cells except " +
      "n_distinct (HLL), which is exact at this cardinality") {
    val exact = TableProfile.profile(df, Seq("a", "b"))
    val approx = TableProfile.approxProfile(df, Seq("a", "b"))
    assert(approx.schema.map(f => (f.name, f.dataType)) ==
      exact.schema.map(f => (f.name, f.dataType)))
    // HLL++ is exact for tiny cardinalities, so full parity holds here
    assert(approx.collect().toSet == exact.collect().toSet)
  }

  test("unknown column is rejected with the column named") {
    val e = intercept[IllegalArgumentException] {
      TableProfile.profile(df, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
