package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.ClassicQueries
import graft.streaming.StreamingRollingAnomaly
import graft.streaming.StreamingRollingAnomaly.{Anom, Ev}

/** Streaming rolling-anomaly ≡ batch [[ClassicQueries
  * .rollingAnomalyOf]] across random chops: the per-key state IS the
  * trailing window, so any micro-batch boundary yields the identical
  * flagged set. */
class StreamingRollingAnomalySpec extends GraftSuite {
  import spark.implicits._

  /** Per-user in-order readings: a stable band with injected spikes
    * (guaranteed anomalies) and a constant-value user (sd = 0 — never
    * flagged). */
  private def gen(seed: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val rows = for {
      u <- 1L to 6L
      i <- 0 until 120
    } yield {
      val base =
        if (u == 6L) 50.0 // constant: sd 0
        else 100.0 + u * 10 + rnd.nextGaussian()
      val v = if (u != 6L && i % 37 == 20) base + 40.0 else base
      Ev(u, u * 1000 + i, i.toLong * 1000000L, v)
    }
    rows.sortBy(e => (e.tUs, e.eventId))
  }

  private def chop(rows: Seq[Ev], seed: Int): Seq[Seq[Ev]] = {
    val rnd = new scala.util.Random(seed)
    var rest = rows
    val out = Seq.newBuilder[Seq[Ev]]
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(math.max(1, rest.size / 4))
      out += rest.take(take)
      rest = rest.drop(take)
    }
    out.result()
  }

  private def batchRef(rows: Seq[Ev]): Set[(Long, Long, Double)] = {
    val df = rows.map(e => (e.eventId, new Timestamp(e.tUs / 1000L),
        e.userId, e.value))
      .toDF("event_id", "ts", "user_id", "value")
    ClassicQueries.rollingAnomalyOf(df)
      .select(col("user_id"), col("event_id"), col("z"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("streamed flags ≡ batch window query across random chops; " +
      "constant series never flags") {
    implicit val sqlCtx = spark.sqlContext
    val rows = gen(23)
    val expected = batchRef(rows)
    assert(expected.nonEmpty, "fixture must produce anomalies")
    assert(!expected.exists(_._1 == 6L), "sd=0 user must never flag")

    val input = MemoryStream[Ev]
    val got = scala.collection.mutable.ArrayBuffer.empty[Anom]
    val q = StreamingRollingAnomaly(input.toDS()).writeStream
      .outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[Anom], _: Long) =>
        got ++= b.collect(); ()
      }
      .start()
    try {
      chop(rows, 41).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(got.map(a => (a.userId, a.eventId, a.z)).toSet == expected)
  }
}
