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

  test("diffFull carries after-images; D rows have NULL payload") {
    val before = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val after = Seq((2L, "bX"), (3L, "c")).toDF("k", "s")
    val out = SnapshotDiff.diffFull(before, after, Seq("k"), Seq("s"))
      .select(col("k"), col("op"), col("s"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((1L, "D", None), (2L, "U", Some("bX")),
      (3L, "I", Some("c"))))
  }

  test("roundtrip law: applyChanges(before, diffFull(before, after)) ≡ after") {
    val rnd = new scala.util.Random(5)
    val before = (1L to 300L).map(k => (k, s"s${rnd.nextInt(4)}",
      rnd.nextInt(100).toDouble)).toDF("k", "s", "v")
    // after: drop ~1/7, mutate ~1/3, insert a fresh tail
    val after = before.filter(col("k") % 7 =!= 0)
      .withColumn("s", when(col("k") % 3 === 0,
        concat(col("s"), lit("!"))).otherwise(col("s")))
      .unionByName(Seq((1001L, "new", 1.0), (1002L, "new", 2.0))
        .toDF("k", "s", "v"))
    val changes = SnapshotDiff.diffFull(before, after, Seq("k"),
      Seq("s", "v"))
    val applied = SnapshotDiff.applyChanges(before, changes, Seq("k"),
      Seq("s", "v"))
    assert(applied.exceptAll(after).isEmpty &&
      after.exceptAll(applied).isEmpty)
    assert(applied.count() == after.count())
    // changelog is change-sized, not snapshot-sized
    assert(changes.count() < before.count())
  }

  test("applyChanges leaves NULL-key base rows untouched") {
    val base = Seq((Option(1L), "a"), (None, "ghost")).toDF("k", "s")
    val changes = Seq((1L, "U", "aX")).toDF("k", "op", "s")
    val out = SnapshotDiff.applyChanges(base, changes, Seq("k"), Seq("s"))
      .select(col("s")).as[String].collect().toSet
    assert(out == Set("aX", "ghost"))
  }
}
