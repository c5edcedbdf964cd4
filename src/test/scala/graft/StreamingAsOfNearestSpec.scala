package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.streaming.{StreamingAsOfDual, StreamingAsOfNearest}
import graft.streaming.StreamingAsOfDual.Tagged

/** [[StreamingAsOfNearest]] — bounded-tolerance nearest enrichment:
  * facts wait for their decision point, then match the batch
  * operator exactly; version state prunes to the moving window. */
class StreamingAsOfNearestSpec extends GraftSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[Tagged]], tolSec: Long,
      delaySec: Long): Map[Long, (Option[Long], Option[String])] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val got = scala.collection.mutable.Map.empty[Long, (Option[Long], Option[String])]
    val q = StreamingAsOfNearest(input.toDS(), tolSec, s"$delaySec seconds")
      .writeStream
      .outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingAsOfDual.Enriched],
         _: Long) =>
          b.collect().foreach(e => got(e.factId) = (e.asofTsUs, e.v))
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    got.toMap
  }

  private def s(sec: Long): Long = sec * 1000000L

  private def flush(tUs: Long): Seq[Seq[Tagged]] =
    Seq(Seq(Tagged("__flush", tUs, 1, -101L, null)),
      Seq(Tagged("__flush", tUs + 1, 1, -102L, null)))

  test("facts match the nearest version within tolerance, ties backward") {
    val batches = Seq(
      Seq(Tagged("a", s(100), 0, -1L, "v100"),
          Tagged("a", s(130), 1, 1L, null),   // 30 back vs 70 fwd → v100
          Tagged("a", s(200), 0, -1L, "v200")),
      Seq(Tagged("a", s(150), 1, 2L, null),   // equidistant 50/50 → v100
          Tagged("a", s(195), 1, 3L, null),   // 5 fwd → v200
          Tagged("a", s(500), 1, 4L, null),   // nothing within ±60
          Tagged("b", s(300), 1, 9L, null))   // key with no versions
    ) ++ flush(s(5000))
    // delay must cover the fixture's disorder (fact@150 arrives after
    // fact@500's batch would push the watermark past it at small delays)
    val got = run(batches, tolSec = 60L, delaySec = 150L)
    assert(got(1L) === (Some(s(100)), Some("v100")))
    assert(got(2L) === (Some(s(100)), Some("v100"))) // pandas tie rule
    assert(got(3L) === (Some(s(200)), Some("v200")))
    assert(got(4L) === (None, None))
    assert(got(9L) === (None, None))
  }

  test("a fact is held until its decision point, then sees a LATER version") {
    // fact arrives BEFORE the version that ends up matching it: the
    // fact must wait until wm >= t + tol rather than decide on arrival
    val batches = Seq(
      Seq(Tagged("a", s(100), 1, 1L, null)),
      Seq(Tagged("a", s(110), 0, -1L, "vlater")),
      Seq(Tagged("a", s(117), 1, 2L, null))
    ) ++ flush(s(5000))
    val got = run(batches, tolSec = 30L, delaySec = 10L)
    assert(got(1L) === (Some(s(110)), Some("vlater"))) // 10 fwd
    assert(got(2L) === (Some(s(110)), Some("vlater"))) // 7 back
  }

  test("streamed ≡ batch asofNearest under bounded disorder") {
    val rnd = new scala.util.Random(61)
    val rows = (Seq.tabulate(60)(i =>
        Tagged(s"k${i % 4}", s(1) + (i / 4).toLong * s(16) + (i % 4), 0, -1L, s"v$i")) ++
      Seq.tabulate(220)(i =>
        Tagged(s"k${rnd.nextInt(5)}", s(1) + rnd.nextInt(250).toLong * s(1), 1, i.toLong, null)))
      .sortBy(_.tUs)
    val tol = 11L
    val facts = rows.filter(_.side == 1)
      .toDF().select(col("k"), timestamp_micros(col("tUs")).as("lt"), col("factId"))
    val dims = rows.filter(_.side == 0)
      .toDF().select(col("k"), timestamp_micros(col("tUs")).as("rt"), col("v"))
    val expected = TemporalJoins.asofNearest(facts, dims, Seq("k"), "lt", "rt",
        tolerance = Some(tol))
      .select(col("factId"), unix_micros(col("asof_ts")), col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))))
      .toMap
    assert(expected.values.exists(_._1.nonEmpty) &&
      expected.values.exists(_._1.isEmpty), "fixture sanity")
    // chop in time order, hold a random third back one batch
    val chops = scala.collection.mutable.ArrayBuffer.empty[Seq[Tagged]]
    var rest = rows
    while (rest.nonEmpty) {
      val take = 5 + rnd.nextInt(25)
      chops += rest.take(take); rest = rest.drop(take)
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Tagged]]
    var held = Seq.empty[Tagged]
    chops.foreach { c =>
      val (hold, now) = c.partition(_ => rnd.nextInt(3) == 0)
      batches += (held ++ now)
      held = hold
    }
    batches += held
    val delaySec = 60L
    val all = batches.toSeq ++ flush(rows.map(_.tUs).max + s(10 * delaySec))
    assert(run(all, tol, delaySec) === expected)
  }
}
