package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Scd2, TemporalJoins}

/** SCD-Type-2 build: instant dedup, heartbeat collapse, interval
  * assembly, NULL contract — plus the scaladoc's integration claim
  * proven differentially: facts as-of-joined against the changelog ≡
  * facts interval-joined against the materialized SCD2 output. */
class Scd2Spec extends GraftSuite {
  import spark.implicits._

  private def chg(rows: (String, Long, Long, String, String, Double)*) =
    rows.toDF("k", "t", "seq", "status", "prio", "ride")

  private def build(df: org.apache.spark.sql.DataFrame) =
    Scd2.fromChangelog(df, keys = Seq("k"), time = "t", seqCol = "seq",
      attrs = Seq("status", "prio"))

  test("heartbeat collapse: a re-stated value opens no version") {
    val out = build(chg(
      ("a", 1L, 1L, "A", "p", 1.0),
      ("a", 2L, 2L, "A", "p", 2.0), // heartbeat — same tracked attrs
      ("a", 3L, 3L, "B", "p", 3.0)))
      .select("k", "status", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      ("a", "A", 1L, Some(3L), false),
      ("a", "B", 3L, None, true)))
  }

  test("same-instant records: highest seq wins the instant") {
    val out = build(chg(
      ("a", 1L, 1L, "A", "p", 1.0),
      ("a", 1L, 2L, "B", "p", 9.0))) // later writer at the instant
      .select("k", "status", "ride", "is_current")
      .as[(String, String, Double, Boolean)].collect().toSet
    assert(out == Set(("a", "B", 9.0, true)))
  }

  test("NULL key / NULL time records are dropped; NULL attr values " +
      "are legitimate (NULL->NULL collapses, NULL->x opens)") {
    val df = Seq(
      (Option("a"), Option(1L), 1L, Option.empty[String], "p"),
      (Option("a"), Option(2L), 2L, Option.empty[String], "p"), // collapse
      (Option("a"), Option(3L), 3L, Option("X"), "p"),          // opens
      (Option.empty[String], Option(4L), 4L, Option("Y"), "p"), // dropped
      (Option("b"), Option.empty[Long], 5L, Option("Z"), "p"))  // dropped
      .toDF("k", "t", "seq", "status", "prio")
    val out = Scd2.fromChangelog(df, Seq("k"), "t", "seq",
        Seq("status", "prio"))
      .select("k", "status", "valid_from", "is_current")
      .as[(String, Option[String], Long, Boolean)].collect().toSet
    assert(out == Set(
      ("a", None, 1L, false),
      ("a", Some("X"), 3L, true)))
  }

  test("ride-along column takes the version-opening record's value") {
    val out = build(chg(
      ("a", 1L, 1L, "A", "p", 10.0),
      ("a", 2L, 2L, "A", "p", 20.0), // heartbeat: its ride is discarded
      ("a", 3L, 3L, "B", "p", 30.0)))
      .select("status", "ride").as[(String, Double)].collect().toSet
    assert(out == Set(("A", 10.0), ("B", 30.0)))
  }

  test("reserved output names are rejected up front") {
    val df = chg(("a", 1L, 1L, "A", "p", 0.0))
      .withColumn("valid_from", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Scd2.fromChangelog(df, Seq("k"), "t", "seq", Seq("status"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("differential: as-of join against the changelog == interval " +
      "join against the SCD2 output (the materialized-twin claim)") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c", "d", "e")
    val log = (1 to 300).map { i =>
      (keys(rnd.nextInt(keys.size)), rnd.nextInt(1000).toLong, i.toLong,
        s"S${rnd.nextInt(3)}", s"P${rnd.nextInt(2)}", rnd.nextDouble())
    }
    val changelog = chg(log: _*)
    val facts = (1 to 400).map(i =>
      (i.toLong, keys(rnd.nextInt(keys.size)), rnd.nextInt(1100).toLong))
      .toDF("fact_id", "k", "ft")

    // as-of side: the changelog must first be unique per (k, t) — the
    // same latest-writer-wins rule SCD2's instant dedup applies
    val deduped = changelog
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("k", "t").orderBy(col("seq").desc)))
      .filter(col("__rn") === 1).drop("__rn", "seq", "ride")
    val viaAsof = TemporalJoins.asofBackward(facts, deduped,
        on = Seq("k"), leftTime = "ft", rightTime = "t")
      .select("fact_id", "status", "prio")

    val dim = build(changelog)
    val viaInterval = facts.alias("f").join(dim.alias("d"),
        col("f.k") === col("d.k") &&
          col("f.ft") >= col("d.valid_from") &&
          (col("d.valid_to").isNull || col("f.ft") < col("d.valid_to")),
        "left")
      .select(col("f.fact_id"), col("d.status"), col("d.prio"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[Row] =
      df.collect().toSet
    assert(rows(viaAsof) == rows(viaInterval))
    // and the comparison is not vacuous: some facts matched, some not
    assert(viaInterval.filter(col("status").isNotNull).count() > 0)
    assert(viaInterval.filter(col("status").isNull).count() > 0)
  }
}
