package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

/** [[SnapshotDiff]] contract: I/D/U classification, null-safe column
  * comparison, attribution order, and the drop rules (unchanged rows,
  * NULL keys). */
class SnapshotDiffSpec extends GraftSuite {
  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, Seq[String])] =
    df.select(col("k"), col("op"), col("changed_cols"))
      .as[(Long, String, Seq[String])].collect()
      .map { case (k, op, ch) => k -> (op, ch) }.toMap

  test("insert / delete / update / unchanged classification") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((2L, "b", 20.0), (3L, "cX", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val out = collect(SnapshotDiff.diff(before, after, Seq("k"),
      Seq("s", "v")))
    assert(out == Map(
      1L -> ("D", Seq("s", "v")),
      3L -> ("U", Seq("s")),
      4L -> ("I", Seq("s", "v"))))
  }

  test("null-safe comparison: null→value and value→null are changes, " +
      "null→null is not") {
    val before = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "s")
    val after = Seq((1L, Option.empty[String]), (2L, Option("b")),
      (3L, Option.empty[String])).toDF("k", "s")
    val out = collect(SnapshotDiff.diff(before, after, Seq("k"), Seq("s")))
    assert(out == Map(
      1L -> ("U", Seq("s")),
      2L -> ("U", Seq("s"))))
  }

  test("changed_cols preserves the declared compare order") {
    val before = Seq((1L, "a", 1.0, "x")).toDF("k", "c1", "c2", "c3")
    val after = Seq((1L, "b", 1.0, "y")).toDF("k", "c1", "c2", "c3")
    val out = collect(SnapshotDiff.diff(before, after, Seq("k"),
      Seq("c3", "c1", "c2")))
    assert(out(1L) == ("U", Seq("c3", "c1")))
  }

  test("NULL keys are dropped from both sides") {
    val before = Seq((Option(1L), "a"), (Option.empty[Long], "n"))
      .toDF("k", "s")
    val after = Seq((Option(1L), "a"), (Option.empty[Long], "m"))
      .toDF("k", "s")
    assert(SnapshotDiff.diff(before, after, Seq("k"), Seq("s")).isEmpty)
  }

  test("composite keys pair on all key columns") {
    val before = Seq((1L, "p", 10.0), (1L, "q", 11.0)).toDF("k", "k2", "v")
    val after = Seq((1L, "p", 10.0), (1L, "q", 12.0), (2L, "p", 5.0))
      .toDF("k", "k2", "v")
    val out = SnapshotDiff.diff(before, after, Seq("k", "k2"), Seq("v"))
      .select(col("k"), col("k2"), col("op"))
      .as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "q", "U"), (2L, "p", "I")))
  }
}
