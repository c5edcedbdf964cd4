package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** [[TemporalJoins]] — hand-computed fixtures plus differentials against
  * the naive theta-join formulations the operators replace. */
class TemporalJoinsSpec extends GraftSuite {
  import spark.implicits._

  private def leftDf(rows: (String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "lt_raw", "lid")
      .select(col("k"), timestamp_seconds(col("lt_raw")).as("lt"), col("lid"))

  private def rightDf(rows: (String, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "rt_raw", "v")
      .select(col("k"), timestamp_seconds(col("rt_raw")).as("rt"), col("v"))

  private def asofRows(out: DataFrame): Map[Long, (Option[Long], Option[String])] =
    out.select(col("lid"), col("asof_ts").cast("long"), col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2))))
      .toMap

  test("asofBackward picks latest right at-or-before each left row") {
    val l = leftDf(("a", 100L, 1L), ("a", 50L, 2L), ("a", 10L, 3L), ("b", 100L, 4L))
    val r = rightDf(("a", 20L, "r20"), ("a", 100L, "r100"), ("b", 999L, "late"))
    val out = asofRows(TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt"))
    assert(out(1L) === (Some(100L), Some("r100"))) // equal instant matches (>=)
    assert(out(2L) === (Some(20L), Some("r20")))
    assert(out(3L) === (None, None))               // nothing at-or-before
    assert(out(4L) === (None, None))               // right exists only after
  }

  test("asofBackward carries a legitimately-NULL right attribute as-is") {
    // The newest right row has v=NULL; a per-column ignoreNulls fill
    // would skip back to the older "old" — the struct pack must not.
    val l = leftDf(("a", 100L, 1L))
    val r = Seq(("a", 10L, Some("old")), ("a", 90L, None))
      .toDF("k", "rt_raw", "v")
      .select(col("k"), timestamp_seconds(col("rt_raw")).as("rt"), col("v"))
    val out = asofRows(TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt"))
    assert(out(1L) === (Some(90L), None))
  }

  test("asofBackward tolerance nulls out stale matches") {
    val l = leftDf(("a", 100L, 1L), ("a", 200L, 2L))
    val r = rightDf(("a", 95L, "x"))
    val out = asofRows(TemporalJoins.asofBackward(
      l, r, Seq("k"), "lt", "rt", tolerance = Some(10L)))
    assert(out(1L) === (Some(95L), Some("x"))) // 5s old, within 10s
    assert(out(2L) === (None, None))           // 105s old, beyond
  }

  test("asofBackward drops NULL-key/NULL-time right rows like a join would") {
    val l = Seq((Some("a"), 100L, 1L), (None, 100L, 2L))
      .toDF("k", "lt_raw", "lid")
      .select(col("k"), timestamp_seconds(col("lt_raw")).as("lt"), col("lid"))
    val r = Seq((Some("a"), Some(10L), "ok"),
        (Some("a"), None, "null_time"),   // would sort first and win last()
        (None, Some(5L), "null_key"))     // would pair with the null-key left
      .toDF("k", "rt_raw", "v")
      .select(col("k"), timestamp_seconds(col("rt_raw")).as("rt"), col("v"))
    val out = asofRows(TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt"))
    assert(out(1L) === (Some(10L), Some("ok"))) // not the NULL-time row
    assert(out(2L) === (None, None))            // NULL key never matches
  }

  test("asofBackward tolerance is exact on sub-second timestamps") {
    val l = Seq(("a", 100900000L, 1L)).toDF("k", "us", "lid") // t=100.9s
      .select(col("k"), timestamp_micros(col("us")).as("lt"), col("lid"))
    val r = Seq(("a", 40200000L, "x")).toDF("k", "us", "v")   // rt=40.2s
      .select(col("k"), timestamp_micros(col("us")).as("rt"), col("v"))
    // true staleness 60.7s: floor-of-seconds math would keep it at 60s
    val out = TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt",
        tolerance = Some(60L))
      .select(col("v")).collect().map(r0 => Option(r0.getString(0)))
    assert(out.toSeq === Seq(None))
  }

  test("asofBackward differential vs theta-join + argmax") {
    val rnd = new scala.util.Random(42)
    val l = leftDf(Seq.tabulate(300)(i =>
      (if (rnd.nextInt(12) == 0) null else s"k${rnd.nextInt(8)}",
        rnd.nextInt(1000).toLong, i.toLong)): _*)
    // unique (k, rt): one right row per (key, instant) by construction;
    // every 11th key is NULL (must never match, like the theta-join)
    val r = rightDf(Seq.tabulate(500)(i =>
      (if (i % 11 == 0) null else s"k${i % 10}",
        (i / 10).toLong * 17 + (i % 10), s"v$i")): _*)
    val got = TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt")
      .select(col("lid"), col("asof_ts"), col("v"))
    val naive = l.join(r, l("k") === r("k") && col("lt") >= col("rt"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lid")).orderBy(col("rt").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("lid"), col("rt").as("asof_ts"), col("v"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("asofForward picks earliest right at-or-after; tolerance bounds ahead") {
    val l = leftDf(("a", 100L, 1L), ("a", 300L, 2L), ("a", 999L, 3L))
    val r = rightDf(("a", 100L, "r100"), ("a", 250L, "r250"), ("a", 400L, "r400"))
    val out = asofRows(TemporalJoins.asofForward(l, r, Seq("k"), "lt", "rt"))
    assert(out(1L) === (Some(100L), Some("r100"))) // equal instant (<=)
    assert(out(2L) === (Some(400L), Some("r400")))
    assert(out(3L) === (None, None))               // nothing at-or-after
    val tol = asofRows(TemporalJoins.asofForward(l, r, Seq("k"), "lt", "rt",
      tolerance = Some(50L)))
    assert(tol(2L) === (None, None)) // next match is 100s ahead, > 50s
  }

  test("asofForward differential vs theta-join + argmin") {
    val rnd = new scala.util.Random(21)
    val l = leftDf(Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong)): _*)
    val r = rightDf(Seq.tabulate(500)(i =>
      (s"k${i % 10}", (i / 10).toLong * 17 + (i % 10), s"v$i")): _*)
    val got = TemporalJoins.asofForward(l, r, Seq("k"), "lt", "rt")
      .select(col("lid"), col("asof_ts"), col("v"))
    val naive = l.join(r, l("k") === r("k") && col("lt") <= col("rt"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lid")).orderBy(col("rt").asc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("lid"), col("rt").as("asof_ts"), col("v"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("asofNearest picks the closer side; equidistant ties go backward") {
    val l = leftDf(("a", 100L, 1L), ("a", 206L, 2L), ("a", 150L, 3L),
      ("a", 500L, 4L), ("b", 7L, 5L))
    val r = rightDf(("a", 90L, "r90"), ("a", 200L, "r200"),
      ("a", 210L, "r210"))
    val out = asofRows(TemporalJoins.asofNearest(l, r, Seq("k"), "lt", "rt"))
    assert(out(1L) === (Some(90L), Some("r90")))    // 10 back vs 100 fwd
    assert(out(2L) === (Some(210L), Some("r210")))  // 6 back vs 4 fwd
    assert(out(3L) === (Some(200L), Some("r200")))  // 60 back vs 50 fwd
    assert(out(4L) === (Some(210L), Some("r210")))  // only backward exists
    assert(out(5L) === (None, None))                // key has no rights
    // exact equidistance: 55 back vs 55 fwd → backward (pandas rule)
    val tie = asofRows(TemporalJoins.asofNearest(
      leftDf(("a", 145L, 9L)), r, Seq("k"), "lt", "rt"))
    assert(tie(9L) === (Some(90L), Some("r90")))
    // tolerance bounds the ABSOLUTE distance
    val tol = asofRows(TemporalJoins.asofNearest(l, r, Seq("k"), "lt", "rt",
      tolerance = Some(5L)))
    assert(tol(1L) === (None, None))
    assert(tol(2L) === (Some(210L), Some("r210")))
  }

  test("asofNearest differential vs theta-join + argmin of |distance|") {
    val rnd = new scala.util.Random(47)
    val l = leftDf(Seq.tabulate(300)(i =>
      (if (rnd.nextInt(12) == 0) null else s"k${rnd.nextInt(8)}",
        rnd.nextInt(1000).toLong, i.toLong)): _*)
    val r = rightDf(Seq.tabulate(500)(i =>
      (if (i % 11 == 0) null else s"k${i % 10}",
        (i / 10).toLong * 17 + (i % 10), s"v$i")): _*)
    val got = TemporalJoins.asofNearest(l, r, Seq("k"), "lt", "rt")
      .select(col("lid"), col("asof_ts"), col("v"))
    val dist = abs(unix_micros(col("lt")) - unix_micros(col("rt")))
    val naive = l.join(r, l("k") === r("k"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lid"))
          .orderBy(dist.asc_nulls_last, col("rt").asc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("lid"), col("rt").as("asof_ts"), col("v"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("sliced asof ≡ plain asof at any slice width, both directions") {
    val rnd = new scala.util.Random(31)
    // nulls on both sides, a hot key with half the rows, sparse keys
    val l = leftDf(Seq.tabulate(400)(i =>
      (if (rnd.nextInt(15) == 0) null
       else if (rnd.nextInt(2) == 0) "hot" else s"k${rnd.nextInt(6)}",
        rnd.nextInt(5000).toLong, i.toLong)): _*)
    val r = rightDf(Seq.tabulate(300)(i =>
      (if (i % 13 == 0) null
       else if (i % 2 == 0) "hot" else s"k${i % 8}",
        (i / 4).toLong * 61 + (i % 4), s"v$i")): _*)
    for (width <- Seq(1L, 97L, 1000L, 100000L)) { // many slices … one slice
      val bwd = TemporalJoins.asofBackwardSliced(
        l, r, Seq("k"), "lt", "rt", sliceWidthSec = width)
      val bwdPlain = TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt")
      assert(bwd.exceptAll(bwdPlain).isEmpty &&
        bwdPlain.exceptAll(bwd).isEmpty, s"backward width=$width")
      val fwd = TemporalJoins.asofForwardSliced(
        l, r, Seq("k"), "lt", "rt", sliceWidthSec = width)
      val fwdPlain = TemporalJoins.asofForward(l, r, Seq("k"), "lt", "rt")
      assert(fwd.exceptAll(fwdPlain).isEmpty &&
        fwdPlain.exceptAll(fwd).isEmpty, s"forward width=$width")
    }
  }

  test("sliced nearest asof ≡ plain nearest at any width, with and " +
    "without tolerance") {
    val rnd = new scala.util.Random(59)
    val l = leftDf(Seq.tabulate(400)(i =>
      (if (rnd.nextInt(15) == 0) null
       else if (rnd.nextInt(2) == 0) "hot" else s"k${rnd.nextInt(6)}",
        rnd.nextInt(5000).toLong, i.toLong)): _*)
    val r = rightDf(Seq.tabulate(300)(i =>
      (if (i % 13 == 0) null
       else if (i % 2 == 0) "hot" else s"k${i % 8}",
        (i / 4).toLong * 61 + (i % 4), s"v$i")): _*)
    for (width <- Seq(1L, 97L, 1000L, 100000L);
         tol <- Seq(None, Some(120L))) {
      val sliced = TemporalJoins.asofNearestSliced(
        l, r, Seq("k"), "lt", "rt", sliceWidthSec = width, tolerance = tol)
      val plain = TemporalJoins.asofNearest(
        l, r, Seq("k"), "lt", "rt", tolerance = tol)
      assert(sliced.exceptAll(plain).isEmpty &&
        plain.exceptAll(sliced).isEmpty, s"width=$width tol=$tol")
    }
    // the equidistant tie resolves backward through the sliced path
    // even when the two candidates live in different slices
    val tie = asofRows(TemporalJoins.asofNearestSliced(
      leftDf(("a", 145L, 9L)),
      rightDf(("a", 90L, "r90"), ("a", 200L, "r200")),
      Seq("k"), "lt", "rt", sliceWidthSec = 60L))
    assert(tie(9L) === (Some(90L), Some("r90")))
  }

  test("sliced asof honors tolerance across slice boundaries") {
    // match carried from a far-earlier slice, then nulled by tolerance
    val l = leftDf(("a", 10000L, 1L), ("a", 10030L, 2L))
    val r = rightDf(("a", 9950L, "old"))
    val out = asofRows(TemporalJoins.asofBackwardSliced(
      l, r, Seq("k"), "lt", "rt", sliceWidthSec = 60L,
      tolerance = Some(60L)))
    assert(out(1L) === (Some(9950L), Some("old"))) // 50s stale, carried
    assert(out(2L) === (None, None))               // 80s stale
    // and a legitimately-NULL right attribute is not "filled" by carry
    val r2 = Seq(("a", 9950L, Some("old")), ("a", 9990L, None))
      .toDF("k", "rt_raw", "v")
      .select(col("k"), timestamp_seconds(col("rt_raw")).as("rt"), col("v"))
    val out2 = asofRows(TemporalJoins.asofBackwardSliced(
      l, r2, Seq("k"), "lt", "rt", sliceWidthSec = 60L))
    assert(out2(1L) === (Some(9990L), None))
  }

  private def pointsDf(rows: (String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "pt_raw", "pid")
      .select(col("k"), timestamp_seconds(col("pt_raw")).as("pt"), col("pid"))

  private def ivDf(rows: (String, Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "s_raw", "e_raw", "ivid")
      .select(col("k"), timestamp_seconds(col("s_raw")).as("ws"),
        timestamp_seconds(col("e_raw")).as("we"), col("ivid"))

  test("intervalJoinPoints half-open containment, any interval/bucket ratio") {
    val pts = pointsDf(("a", 10L, 1L), ("a", 99L, 2L), ("a", 100L, 3L),
      ("a", 250L, 4L), ("b", 10L, 5L))
    val iv = ivDf(("a", 10L, 100L, 1L), ("a", 200L, 1000L, 2L))
    for (width <- Seq(7L, 50L, 1000L)) { // < len, ~len, >> len
      val got = TemporalJoins.intervalJoinPoints(
          pts, iv, Seq("k"), "pt", "ws", "we", bucketWidthSec = width)
        .select(col("pid"), col("ivid")).as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 1L), (2L, 1L), (4L, 2L)), s"width=$width")
    }
  }

  test("intervalJoinPoints drops degenerate (end < start) intervals") {
    val pts = pointsDf(("a", 10L, 1L))
    val iv = ivDf(("a", 500L, 0L, 1L)) // reversed; naive sequence would explode
    assert(TemporalJoins.intervalJoinPoints(
      pts, iv, Seq("k"), "pt", "ws", "we", 60L).isEmpty)
  }

  test("intervalJoinPoints left flavor keeps uncovered points once") {
    val pts = pointsDf(("a", 10L, 1L), ("a", 500L, 2L), ("b", 10L, 3L))
    val iv = ivDf(("a", 0L, 100L, 1L), ("a", 5L, 50L, 2L))
    val got = TemporalJoins.intervalJoinPoints(
        pts, iv, Seq("k"), "pt", "ws", "we", 7L, joinType = "left")
      .select(col("pid"), col("ivid"))
      .as[(Long, Option[Long])].collect().toSeq.sorted
    // pid 1 in both intervals; pid 2 (t=500) and pid 3 (key b) in none
    // — each survives exactly ONCE despite owning a bucket that meets
    // several non-containing interval rows
    assert(got === Seq((1L, Some(1L)), (1L, Some(2L)),
      (2L, None), (3L, None)))
  }

  test("intervalJoinPoints left differential vs naive left range join") {
    val rnd = new scala.util.Random(53)
    val pts = pointsDf(Seq.tabulate(400)(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(2000).toLong, i.toLong)): _*)
    val iv = ivDf(Seq.tabulate(60)(i => {
      val s = rnd.nextInt(2000).toLong
      (s"k${rnd.nextInt(6)}", s, s + rnd.nextInt(200), i.toLong)
    }): _*)
    val got = TemporalJoins.intervalJoinPoints(
        pts, iv, Seq("k"), "pt", "ws", "we", bucketWidthSec = 100L,
        joinType = "left")
      .select(col("pid"), col("ivid"))
    val naive = pts.join(iv,
        pts("k") === iv("k") && col("pt") >= col("ws") && col("pt") < col("we"),
        "left")
      .select(col("pid"), col("ivid"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("intervalJoinPoints differential vs inequality join") {
    val rnd = new scala.util.Random(7)
    val pts = pointsDf(Seq.tabulate(400)(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(2000).toLong, i.toLong)): _*)
    val iv = ivDf(Seq.tabulate(80)(i => {
      val s = rnd.nextInt(2000).toLong
      (s"k${rnd.nextInt(6)}", s, s + rnd.nextInt(300), i.toLong)
    }): _*)
    val got = TemporalJoins.intervalJoinPoints(
        pts, iv, Seq("k"), "pt", "ws", "we", bucketWidthSec = 100L)
      .select(col("pid"), col("ivid"))
    val naive = pts.join(iv,
        pts("k") === iv("k") && col("pt") >= col("ws") && col("pt") < col("we"))
      .select(col("pid"), col("ivid"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("sessionizeByGap compares gaps at microsecond precision") {
    // 1800.5s gap must open a session at gapSec=1800 (floor math says
    // 1800, not > 1800); 1799.5s must not
    val df = Seq(("a", 0L, 1L), ("a", 1800500000L, 2L),
        ("b", 0L, 3L), ("b", 1799500000L, 4L))
      .toDF("k", "us", "id")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("id"))
    val got = TemporalJoins.sessionizeByGap(df, Seq("k"), "t", 1800L)
      .select(col("id"), col("session_id")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("sessionizeByGap numbers sessions per key, ties never split") {
    val df = Seq(
      ("a", 0L, 1L), ("a", 50L, 2L), ("a", 50L, 3L), // tie inside session
      ("a", 200L, 4L),                               // gap 150 > 100 → new
      ("b", 0L, 5L), ("b", 101L, 6L))                // gap 101 > 100 → new
      .toDF("k", "t_raw", "id")
      .select(col("k"), timestamp_seconds(col("t_raw")).as("t"), col("id"))
    val got = TemporalJoins.sessionizeByGap(df, Seq("k"), "t", gapSec = 100L)
      .select(col("id"), col("session_id")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 1L, 6L -> 2L))
  }

  test("sessionizeByGapSliced ≡ sessionizeByGap at any slice width") {
    val rnd = new scala.util.Random(37)
    // a hot key with half the rows, NULL keys (the stitch join must
    // be null-safe or they vanish), duplicate timestamps, sub-second
    // gaps straddling the threshold, sparse keys
    val df = Seq.tabulate(600) { i =>
      val k = if (rnd.nextInt(15) == 0) null
        else if (rnd.nextInt(2) == 0) "hot" else s"k${rnd.nextInt(5)}"
      val us = rnd.nextInt(400).toLong * 1000000L +
        (if (rnd.nextInt(3) == 0) 500000L else 0L)
      (k, us, i.toLong)
    }.toDF("k", "us", "id")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("id"))
    assert(df.filter(col("k").isNull).count() > 0, "fixture sanity")
    val plain = TemporalJoins.sessionizeByGap(df, Seq("k"), "t", 30L)
      .select(col("id"), col("session_id"))
    for (width <- Seq(1L, 17L, 60L, 100000L)) { // many slices … one slice
      val sliced = TemporalJoins.sessionizeByGapSliced(
          df, Seq("k"), "t", 30L, sliceWidthSec = width)
        .select(col("id"), col("session_id"))
      assert(sliced.exceptAll(plain).isEmpty &&
        plain.exceptAll(sliced).isEmpty, s"width=$width")
    }
  }

  test("sessionizeByGapSliced: boundary gaps exact at microseconds") {
    // 30.5s gap straddling a slice boundary must open a session at
    // gapSec=30 even though floor-seconds math would say 30; a 29.5s
    // cross-boundary gap must NOT
    val df = Seq(("a", 59000000L, 1L), ("a", 89500000L, 2L),
        ("b", 59500000L, 3L), ("b", 89000000L, 4L))
      .toDF("k", "us", "id")
      .select(col("k"), timestamp_micros(col("us")).as("t"), col("id"))
    val got = TemporalJoins.sessionizeByGapSliced(
        df, Seq("k"), "t", 30L, sliceWidthSec = 60L)
      .select(col("id"), col("session_id")).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("sessionizeByGapSliced replaces an existing session_id column") {
    // re-sessionizing at a different gap must yield ONE session_id
    // column, like the plain operator's withColumn replacement
    val df = Seq(("a", 0L, 1L), ("a", 100L, 2L)).toDF("k", "t_raw", "id")
      .select(col("k"), timestamp_seconds(col("t_raw")).as("t"), col("id"))
    val once = TemporalJoins.sessionizeByGapSliced(df, Seq("k"), "t", 200L, 60L)
    val again = TemporalJoins.sessionizeByGapSliced(once, Seq("k"), "t", 50L, 60L)
    assert(again.columns.count(_ == "session_id") === 1)
    assert(again.select(col("id"), col("session_id")).as[(Long, Long)]
      .collect().toMap === Map(1L -> 1L, 2L -> 2L))
  }

  test("intervalJoinIntervals: overlap pairs exactly once, any width") {
    val l = ivDf(("a", 0L, 100L, 1L), ("a", 500L, 600L, 2L), ("b", 0L, 50L, 3L))
    val r = Seq(("a", 90L, 510L, 10L), ("a", 600L, 700L, 11L), ("b", 50L, 99L, 12L))
      .toDF("k", "s_raw", "e_raw", "rid")
      .select(col("k"), timestamp_seconds(col("s_raw")).as("rs"),
        timestamp_seconds(col("e_raw")).as("re"), col("rid"))
    for (width <- Seq(7L, 100L, 5000L)) {
      val got = TemporalJoins.intervalJoinIntervals(
          l, r, Seq("k"), "ws", "we", "rs", "re", width)
        .select(col("ivid"), col("rid")).as[(Long, Long)].collect().toSeq
      // iv1×r10 overlap [90,100); iv2×r10 overlap [500,510); iv2×r11
      // touch only at 600 (half-open, no); b: [0,50)×[50,99) touch, no
      assert(got.sorted === Seq((1L, 10L), (2L, 10L)), s"width=$width")
      assert(got.size === got.distinct.size, s"dupes at width=$width")
    }
  }

  test("intervalJoinIntervals differential vs inequality join") {
    val rnd = new scala.util.Random(13)
    def ivs(n: Int, tag: Long) = Seq.tabulate(n) { i =>
      val s = rnd.nextInt(2000).toLong
      (s"k${rnd.nextInt(5)}", s, s + rnd.nextInt(400), tag + i)
    }
    val l = ivDf(ivs(120, 0L): _*)
    val r = Seq(ivs(150, 1000L): _*).toDF("k", "s_raw", "e_raw", "rid")
      .select(col("k"), timestamp_seconds(col("s_raw")).as("rs"),
        timestamp_seconds(col("e_raw")).as("re"), col("rid"))
    val got = TemporalJoins.intervalJoinIntervals(
        l, r, Seq("k"), "ws", "we", "rs", "re", bucketWidthSec = 150L)
      .select(col("ivid"), col("rid"))
    val naive = l.join(r,
        l("k") === r("k") && col("ws") < col("re") && col("rs") < col("we"))
      .select(col("ivid"), col("rid"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("asofForward leaves NULL left-time rows unmatched (both directions)") {
    // forward's desc scan puts NULLs last, where last() would hand
    // them the EARLIEST right row — DuckDB ASOF leaves them unmatched
    val l = Seq(("a", Some(100L), 1L), ("a", None, 2L))
      .toDF("k", "lt_raw", "lid")
      .select(col("k"), timestamp_seconds(col("lt_raw")).as("lt"), col("lid"))
    val r = rightDf(("a", 50L, "r50"), ("a", 200L, "r200"))
    val fwd = asofRows(TemporalJoins.asofForward(l, r, Seq("k"), "lt", "rt"))
    assert(fwd(1L) === (Some(200L), Some("r200")))
    assert(fwd(2L) === (None, None))
    val bwd = asofRows(TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt"))
    assert(bwd(1L) === (Some(50L), Some("r50")))
    assert(bwd(2L) === (None, None))
  }

  test("asof fails fast on left/right column-name collisions") {
    val l = leftDf(("a", 100L, 1L)).withColumn("v", lit("mine"))
    val r = rightDf(("a", 50L, "r50")) // right value col also "v"
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(l, r, Seq("k"), "lt", "rt")
    }
    assert(e.getMessage.contains("v"))
    // asofTsCol colliding with an existing left column is the same bug
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(leftDf(("a", 100L, 1L)), r,
        Seq("k"), "lt", "rt", asofTsCol = "lid")
    }
    assert(e2.getMessage.contains("lid"))
    // reserved internal names rejected rather than silently clobbered
    val e3 = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(
        leftDf(("a", 100L, 1L)).withColumn("__side", lit(9)),
        r, Seq("k"), "lt", "rt")
    }
    assert(e3.getMessage.contains("__side"))
    // asofTsCol colliding with a RIGHT value column: renaming
    // rightTime onto it would leave two identically-named columns
    val e4 = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(leftDf(("a", 100L, 1L)), r,
        Seq("k"), "lt", "rt", asofTsCol = "v")
    }
    assert(e4.getMessage.contains("v"))
    // same contract enforced by the sliced variants
    val e5 = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackwardSliced(leftDf(("a", 100L, 1L)), r,
        Seq("k"), "lt", "rt", 60L, asofTsCol = "v")
    }
    assert(e5.getMessage.contains("v"))
  }

  test("interval joins accept same-named bound columns on both sides") {
    // both frames call their bounds (s, e) — the post-join filters
    // must resolve through the per-side frames, not bare col()
    def mk(tag: Long, rows: (String, Long, Long, Long)*) =
      rows.toSeq.toDF("k", "s_raw", "e_raw", "id")
        .select(col("k"), timestamp_seconds(col("s_raw")).as("s"),
          timestamp_seconds(col("e_raw")).as("e"), (col("id") + tag).as("id"))
    val l = mk(0L, ("a", 0L, 100L, 1L), ("a", 500L, 600L, 2L))
    val r = mk(100L, ("a", 90L, 510L, 1L), ("a", 600L, 700L, 2L))
    // (post-join the two `id` columns are ambiguous by NAME, like any
    // Spark join with duplicate names — the join itself must work)
    assert(TemporalJoins.intervalJoinIntervals(
      l, r, Seq("k"), "s", "e", "s", "e", 100L).count() === 2)
    // point side sharing the interval's start-bound name
    val pts = Seq(("a", 50L, 7L)).toDF("k", "s_raw", "pid")
      .select(col("k"), timestamp_seconds(col("s_raw")).as("s"), col("pid"))
    val ivs = mk(0L, ("a", 0L, 100L, 1L))
    val gotP = TemporalJoins.intervalJoinPoints(
      pts, ivs, Seq("k"), "s", "s", "e", 60L)
    assert(gotP.count() === 1)
  }

  test("intervalJoinPoints expansion cap fails loud, passes under cap") {
    val pts = pointsDf(("a", 10L, 1L))
    // [0, 36000): 601 buckets at width 60
    val iv = ivDf(("a", 0L, 36000L, 1L))
    val e = intercept[Exception] { quietly {
      TemporalJoins.intervalJoinPoints(pts, iv, Seq("k"), "pt", "ws", "we",
        60L, maxBucketsPerInterval = Some(100L)).count()
    } }
    assert(e.getMessage.contains("maxBucketsPerInterval"), e.getMessage)
    val ok = TemporalJoins.intervalJoinPoints(pts, iv, Seq("k"), "pt",
      "ws", "we", 60L, maxBucketsPerInterval = Some(1000L))
    assert(ok.count() === 1)
    val iv2 = Seq(("a", 0L, 36000L, 1L)).toDF("k", "s_raw", "e_raw", "rid")
      .select(col("k"), timestamp_seconds(col("s_raw")).as("rs"),
        timestamp_seconds(col("e_raw")).as("re"), col("rid"))
    val e2 = intercept[Exception] { quietly {
      TemporalJoins.intervalJoinIntervals(iv, iv2, Seq("k"), "ws", "we",
        "rs", "re", 60L, maxBucketsPerInterval = Some(100L)).count()
    } }
    assert(e2.getMessage.contains("maxBucketsPerInterval"), e2.getMessage)
  }

  test("suggestBucketWidth probes the interval-length percentile") {
    // lengths 10,20,...,100 (plus a degenerate row that must be
    // ignored); p75 over 10 values = 80, p100 = 100
    val iv = ivDf((Seq.tabulate(10)(i =>
      ("a", 0L, (i + 1) * 10L, i.toLong)) :+ ("a", 50L, 40L, 99L)): _*)
    assert(TemporalJoins.suggestBucketWidth(iv, "ws", "we") === 80L)
    assert(TemporalJoins.suggestBucketWidth(iv, "ws", "we", 1.0) === 100L)
    // empty / all-degenerate table → floor of 1, not a crash
    assert(TemporalJoins.suggestBucketWidth(
      ivDf(("a", 50L, 40L, 1L)), "ws", "we") === 1L)
  }

  test("intervalJoinPoints plans an equi-join, not a nested loop") {
    val pts = pointsDf(("a", 10L, 1L))
    val iv = ivDf(("a", 0L, 100L, 1L))
    val plan = TemporalJoins.intervalJoinPoints(
      pts, iv, Seq("k"), "pt", "ws", "we", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
