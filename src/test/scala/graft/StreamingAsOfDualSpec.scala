package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.streaming.StreamingAsOfDual
import graft.streaming.StreamingAsOfDual.Tagged

/** Dual-stream as-of ≡ batch as-of under the ordered-arrival contract;
  * dimension versions take effect across batch boundaries. */
class StreamingAsOfDualSpec extends GraftSuite {
  import spark.implicits._

  private def run(batches: Seq[Seq[Tagged]],
      tolerance: Option[Long] = None): Map[Long, (Option[Long], Option[String])] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tagged]
    val got = scala.collection.mutable.Map.empty[Long, (Option[Long], Option[String])]
    val q = StreamingAsOfDual(input.toDS(), tolerance).writeStream
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

  test("streamed ≡ batch asofBackward across time-ordered batch chops") {
    val rnd = new scala.util.Random(17)
    val rows = (Seq.tabulate(120)(i =>
        Tagged(s"k${i % 7}", (i / 7).toLong * 13000000L + (i % 7), 0, -1L, s"v$i")) ++
      Seq.tabulate(300)(i =>
        Tagged(s"k${rnd.nextInt(8)}", rnd.nextInt(250).toLong * 1000000L, 1, i.toLong, null)))
      .sortBy(_.tUs) // ordered arrival per key (global order is stronger)
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
    assert(expected.values.exists(_._1.nonEmpty) &&
      expected.values.exists(_._1.isEmpty), "fixture sanity")
    var rest = rows
    val batches = Seq.newBuilder[Seq[Tagged]]
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(math.max(1, rest.size / 3))
      batches += rest.take(take)
      rest = rest.drop(take)
    }
    assert(run(batches.result()) === expected)
  }

  test("streamed ≡ batch with tolerance set, across random chops") {
    val rnd = new scala.util.Random(23)
    val rows = (Seq.tabulate(60)(i =>
        Tagged(s"k${i % 4}", (i / 4).toLong * 20000000L + (i % 4), 0, -1L, s"v$i")) ++
      Seq.tabulate(200)(i =>
        Tagged(s"k${rnd.nextInt(5)}", rnd.nextInt(320).toLong * 1000000L, 1, i.toLong, null)))
      .sortBy(_.tUs)
    val tol = 7L // seconds — small enough that many matches go stale
    val facts = rows.filter(_.side == 1)
      .toDF().select(col("k"), timestamp_micros(col("tUs")).as("lt"), col("factId"))
    val dims = rows.filter(_.side == 0)
      .toDF().select(col("k"), timestamp_micros(col("tUs")).as("rt"), col("v"))
    val expected = TemporalJoins.asofBackward(facts, dims, Seq("k"), "lt", "rt",
        tolerance = Some(tol))
      .select(col("factId"), unix_micros(col("asof_ts")), col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))))
      .toMap
    assert(expected.values.exists(_._1.nonEmpty) &&
      expected.values.exists(_._1.isEmpty), "fixture sanity")
    var rest = rows
    val batches = Seq.newBuilder[Seq[Tagged]]
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(math.max(1, rest.size / 3))
      batches += rest.take(take)
      rest = rest.drop(take)
    }
    assert(run(batches.result(), tolerance = Some(tol)) === expected)
  }

  test("a version folded in one batch enriches facts in later batches") {
    val got = run(Seq(
      Seq(Tagged("a", 10L, 0, -1L, "v1")),
      Seq(Tagged("a", 50L, 1, 1L, null)),   // matches v1 from batch 1
      Seq(Tagged("a", 60L, 0, -1L, "v2"),
          Tagged("a", 70L, 1, 2L, null)),   // matches v2 within batch
      Seq(Tagged("b", 5L, 1, 3L, null))))   // no version for key b
    assert(got === Map(
      1L -> (Some(10L), Some("v1")),
      2L -> (Some(60L), Some("v2")),
      3L -> (None, None)))
  }
}
