package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins
import graft.streaming.StreamingAsOf

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class Fact(k: String, t: Long, fid: Long)

/** Stream-static as-of enrichment parity with the batch operator. */
class StreamingAsOfSpec extends GraftSuite {
  import spark.implicits._

  private def dimDf(rows: (String, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "rt_raw", "v")
      .select(col("k"), timestamp_seconds(col("rt_raw")).as("rt"), col("v"))

  private def factsDf(rows: Seq[Fact]): DataFrame =
    rows.toDF()
      .select(col("k"), timestamp_seconds(col("t")).as("lt"), col("fid"))

  private def run(dimRows: Seq[(String, Long, String)],
      batches: Seq[Seq[Fact]],
      tolerance: Option[Long] = None): Map[Long, (Option[Long], Option[String])] = {
    implicit val sqlCtx = spark.sqlContext
    val dim = StreamingAsOf.dimSnapshot(dimDf(dimRows: _*))
    val got = scala.collection.mutable.Map.empty[Long, (Option[Long], Option[String])]
    val input = MemoryStream[Fact]
    val stream = input.toDF()
      .select(col("k"), timestamp_seconds(col("t")).as("lt"), col("fid"))
    val q = StreamingAsOf.start(stream, dim, Seq("k"), "lt", "rt",
      emit = df => df.select(col("fid"), col("asof_ts").cast("long"), col("v"))
        .collect().foreach(r => got(r.getLong(0)) =
          (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))),
      tolerance = tolerance)
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    got.toMap
  }

  test("streamed enrichment equals batch asofBackward across splits") {
    val rnd = new scala.util.Random(11)
    val dimRows = Seq.tabulate(60)(i => (s"k${i % 5}", (i / 5).toLong * 37, s"v$i"))
    val facts = Seq.tabulate(150)(i =>
      Fact(s"k${rnd.nextInt(6)}", rnd.nextInt(500).toLong, i.toLong))
    val expected = TemporalJoins.asofBackward(
        factsDf(facts), dimDf(dimRows: _*), Seq("k"), "lt", "rt")
      .select(col("fid"), col("asof_ts").cast("long"), col("v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2)))))
      .toMap
    assert(expected.nonEmpty && expected.values.exists(_._1.nonEmpty),
      "fixture sanity: some facts match")
    assert(expected.values.exists(_._1.isEmpty),
      "fixture sanity: some facts unmatched (k5 has no dim rows)")
    var rest = facts
    val batches = Seq.newBuilder[Seq[Fact]]
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(math.max(1, rest.size / 3))
      batches += rest.take(take)
      rest = rest.drop(take)
    }
    assert(run(dimRows, batches.result()) === expected)
  }

  test("tolerance applies per batch exactly as in the batch operator") {
    val dimRows = Seq(("a", 100L, "fresh"), ("b", 0L, "stale"))
    val facts = Seq(Fact("a", 105L, 1L), Fact("b", 500L, 2L))
    val got = run(dimRows, Seq(facts.take(1), facts.drop(1)),
      tolerance = Some(60L))
    assert(got(1L) === (Some(100L), Some("fresh")))
    assert(got(2L) === (None, None)) // match exists but is 500s stale
  }
}
