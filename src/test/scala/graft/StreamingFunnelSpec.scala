package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Funnel
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FEvent

/** [[StreamingFunnel]] — stage completions emitted by the stream must
  * equal the batch [[Funnel.stageTimes]] non-null cells, including
  * out-of-order arrival inside the watermark. */
class StreamingFunnelSpec extends GraftSuite {
  import spark.implicits._

  private val S3 = Seq("view", "click", "purchase")

  private def fe(uid: Long, etype: String, sec: Long): FEvent =
    FEvent(uid, etype, sec * 1000000L,
      new java.sql.Timestamp(sec * 1000L))

  private def batchDf(evs: Seq[FEvent]): DataFrame =
    evs.map(e => (e.ent, e.etype, e.tsUs / 1000000L))
      .toDF("uid", "etype", "sec")
      .select($"uid", $"etype", timestamp_seconds($"sec").as("ts"))

  /** Batch twin: non-null stage cells as (uid, stage, µs). */
  private def expectedHits(evs: Seq[FEvent]): Set[(Long, String, Long)] =
    Funnel.stageTimes(batchDf(evs), "uid", "etype", "ts", S3)
      .select($"uid" +: S3.map(s => unix_micros(col(s"t_$s")).as(s)): _*)
      .collect()
      .flatMap(r => S3.zipWithIndex.flatMap { case (s, i) =>
        Option(r.get(i + 1)).map(t =>
          (r.getAs[Long]("uid"), s, t.asInstanceOf[Long]))
      }).toSet

  private def run(batches: Seq[Seq[FEvent]], delay: String,
      sink: String): Set[(Long, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FEvent]
    val query = StreamingFunnel(input.toDF().drop("tsUs"),
        "ent", "etype", "ets", S3, delay)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    spark.table(sink).as[StreamingFunnel.StageHit].collect()
      .map(h => (h.ent, h.stage, h.tsUs)).toSet
  }

  // watermark movers: STAGE-typed (the funnel's clock runs on stage
  // events — non-stage rows are filtered before the watermark node)
  private def sentinels(sec1: Long, sec2: Long): Seq[Seq[FEvent]] =
    Seq(Seq(fe(999L, "view", sec1)), Seq(fe(999L, "view", sec2)))

  test("a click arriving BEFORE its view (within the delay) still converts") {
    // stream order: click(200) in batch 1, view(100) in batch 2 —
    // the buffer must release them in event-time order
    val evs = Seq(fe(1, "click", 200), fe(1, "view", 100),
      fe(1, "purchase", 300))
    val batches = Seq(Seq(evs(0)), Seq(evs(1)), Seq(evs(2))) ++
      sentinels(100000, 100001)
    val got = run(batches, "2 hours", "funnel_out1")
    assert(got == expectedHits(evs))
    assert(got == Set((1L, "view", 100000000L), (1L, "click", 200000000L),
      (1L, "purchase", 300000000L)))
  }

  test("beyond-watermark stage event under-fills, never mis-orders") {
    // the view is 10h late against a 1h delay: dropped by admission,
    // so the click can never qualify — funnel stays empty for uid 2
    val batches = Seq(
      Seq(fe(2, "click", 50000)),
      Seq(fe(999, "view", 90000)), // watermark → 90000 - 3600
      Seq(fe(2, "view", 40000)),   // below watermark: dropped
      Seq(fe(2, "click", 95000))) ++ sentinels(200000, 200001)
    val got = run(batches, "1 hour", "funnel_out2")
    assert(got.filter(_._1 == 2L).isEmpty)
  }

  test("randomized chops with held-back rows ≡ batch stage cells") {
    val rnd = new scala.util.Random(83)
    val types = Seq("view", "click", "purchase", "noise")
    val evs = Seq.tabulate(150) { i =>
      fe(1 + rnd.nextInt(8), types(rnd.nextInt(4)),
        100000L + rnd.nextInt(50000))
    }
    val sorted = evs.sortBy(_.tsUs)
    val chops = scala.collection.mutable.ArrayBuffer.empty[Seq[FEvent]]
    var rest = sorted
    while (rest.nonEmpty) {
      val take = 5 + rnd.nextInt(25)
      chops += rest.take(take); rest = rest.drop(take)
    }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[FEvent]]
    var held = Seq.empty[FEvent]
    chops.foreach { c =>
      val (hold, now) = c.partition(_ => rnd.nextInt(3) == 0)
      batches += (held ++ now)
      held = hold
    }
    batches += held
    // 50000 s span < the 1-day delay: nothing drops
    val got = run(batches.toSeq ++ sentinels(400000, 400001),
      "24 hours", "funnel_out3")
    assert(got.filterNot(_._1 == 999L) == expectedHits(evs))
  }

  test("each stage emits at most once per entity across batches") {
    val evs = Seq(fe(5, "view", 100), fe(5, "view", 50),
      fe(5, "click", 150), fe(5, "click", 120))
    val batches = evs.map(Seq(_)) ++ sentinels(100000, 100001)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FEvent]
    val query = StreamingFunnel(input.toDF().drop("tsUs"),
        "ent", "etype", "ets", S3, "2 hours")
      .writeStream.format("memory").queryName("funnel_out4")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
    } finally query.stop()
    val rows = spark.table("funnel_out4")
      .as[StreamingFunnel.StageHit].collect().filter(_.ent == 5L)
    assert(rows.length == rows.map(_.stage).distinct.length,
      s"duplicate stage emissions: ${rows.toSeq}")
  }
}
