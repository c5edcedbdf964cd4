package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.streaming.{StreamingAsOfDual, StreamingAsOfDualLate}
import graft.streaming.StreamingAsOfDual.Tagged

/** [[StreamingAsOfDualLate]] — late rows inside the watermark match
  * their correct version; rows beyond it are dropped, visibly; the
  * streamed result over released windows ≡ the batch as-of. */
class StreamingAsOfDualLateSpec extends GraftSuite {
  import spark.implicits._

  /** Feed `batches` through the operator; returns (per-fact result,
    * simulated per-batch watermark trace in µs). The harness mirrors
    * Spark's watermark rule — wm(batch n) = max event time seen
    * through batch n−1 minus `delaySec` — so specs can compute which
    * rows Spark itself will drop as too late. */
  private def run(batches: Seq[Seq[Tagged]], delaySec: Long,
      tolerance: Option[Long] = None): (Map[Long, (Option[Long], Option[String])], Seq[Long]) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val got = scala.collection.mutable.Map.empty[Long, (Option[Long], Option[String])]
    val q = StreamingAsOfDualLate(input.toDS(), s"$delaySec seconds", tolerance)
      .writeStream
      .outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingAsOfDual.Enriched],
         _: Long) =>
          b.collect().foreach(e => got(e.factId) = (e.asofTsUs, e.v))
      }
      .start()
    val wms = Seq.newBuilder[Long]
    var maxSeenUs = Long.MinValue
    try {
      batches.foreach { b =>
        wms += (if (maxSeenUs == Long.MinValue) 0L
                else math.max(0L, maxSeenUs - delaySec * 1000000L))
        input.addData(b: _*)
        q.processAllAvailable()
        if (b.nonEmpty) maxSeenUs = math.max(maxSeenUs, b.map(_.tUs).max)
      }
    } finally q.stop()
    (got.toMap, wms.result())
  }

  private def s(sec: Long): Long = sec * 1000000L

  /** Flush sentinels: two far-future batches on an unused key — the
    * first advances the watermark past every real row, the second
    * triggers the armed event-time timeouts under that watermark. */
  private def flush(tUs: Long): Seq[Seq[Tagged]] =
    Seq(Seq(Tagged("__flush", tUs, 1, -101L, null)),
      Seq(Tagged("__flush", tUs + 1, 1, -102L, null)))

  test("late-but-inside-watermark rows match; beyond-watermark rows drop") {
    val batches = Seq(
      // b1 (wm 0): nothing releasable yet
      Seq(Tagged("a", s(10), 0, -1L, "v1"), Tagged("a", s(50), 1, 1L, null)),
      // b2 (wm 40s): f2@45s arrives AFTER f1@50s — late, but ≥ wm
      Seq(Tagged("a", s(45), 1, 2L, null), Tagged("a", s(100), 1, 3L, null)),
      // b3 (wm 90s): v2@95s would beat v1 for f3@100s — but arrives
      // in b4 below the watermark, so Spark drops it
      Seq(Tagged("b", s(200), 1, 9L, null)),
      // b4 (wm 190s): the too-late version, plus a fresh fact
      Seq(Tagged("a", s(95), 0, -1L, "v2"), Tagged("a", s(300), 1, 4L, null))
    ) ++ flush(s(1000))
    val (got, wms) = run(batches, delaySec = 10L)
    assert(wms(2) === s(90) && wms(3) === s(190),
      "harness watermark simulation")
    assert(got(1L) === (Some(s(10)), Some("v1")))
    assert(got(2L) === (Some(s(10)), Some("v1"))) // late fact, matched
    assert(got(3L) === (Some(s(10)), Some("v1"))) // v2 dropped, NOT matched
    assert(got(4L) === (Some(s(10)), Some("v1")))
    assert(got(9L) === (None, None)) // key b: no version at all
  }

  test("streamed ≡ batch asofBackward under bounded disorder") {
    val rnd = new scala.util.Random(29)
    // +s(1): an event at epoch 0 exactly ties the INITIAL watermark
    // and Spark's admission filter (eventTime <= wm) drops it
    val rows = (Seq.tabulate(80)(i =>
        Tagged(s"k${i % 5}", s(1) + (i / 5).toLong * s(13) + (i % 5), 0, -1L, s"v$i")) ++
      Seq.tabulate(250)(i =>
        Tagged(s"k${rnd.nextInt(6)}", s(1) + rnd.nextInt(220).toLong * s(1), 1, i.toLong, null)))
      .sortBy(_.tUs)
    // chop in time order, then hold back a random third of each chop
    // by one batch — bounded disorder, the shape the operator buys
    val chops = scala.collection.mutable.ArrayBuffer.empty[Seq[Tagged]]
    var rest = rows
    while (rest.nonEmpty) {
      val take = 5 + rnd.nextInt(30)
      chops += rest.take(take); rest = rest.drop(take)
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Tagged]]
    var heldBack = Seq.empty[Tagged]
    chops.foreach { c =>
      val (hold, now) = c.partition(_ => rnd.nextInt(3) == 0)
      batches += (heldBack ++ now)
      heldBack = hold
    }
    batches += heldBack
    val delaySec = 60L // > max chop span: nothing may cross the watermark
    val all = batches.toSeq ++ flush(rows.map(_.tUs).max + s(3 * delaySec))
    val (got, wms) = run(all, delaySec)
    // harness sanity: every real row arrived STRICTLY above the
    // watermark (Spark admits eventTime > wm only)
    all.zip(wms).foreach { case (b, wm) =>
      b.filter(_.factId >= -1L).foreach(r =>
        assert(r.tUs > wm, s"fixture leaked a beyond-watermark row"))
    }
    val facts = rows.filter(_.side == 1)
      .toDF().select(col("k"), timestamp_micros(col("tUs")).as("lt"), col("factId"))
    val dims = rows.filter(_.side == 0)
      .toDF().select(col("k"), timestamp_micros(col("tUs")).as("rt"), col("v"))
    val expected = TemporalJoins.asofBackward(facts, dims, Seq("k"), "lt", "rt")
      .select(col("factId"), unix_micros(col("asof_ts")), col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))))
      .toMap
    assert(got === expected)
  }

  test("tolerance nulls stale matches, streamed and batch alike") {
    val batches = Seq(
      Seq(Tagged("a", s(10), 0, -1L, "v1")),
      Seq(Tagged("a", s(15), 1, 1L, null),   // 5s stale: inside 30s
          Tagged("a", s(100), 1, 2L, null))  // 90s stale: outside
    ) ++ flush(s(1000))
    val (got, _) = run(batches, delaySec = 10L, tolerance = Some(30L))
    assert(got(1L) === (Some(s(10)), Some("v1")))
    assert(got(2L) === (None, None))
  }
}
