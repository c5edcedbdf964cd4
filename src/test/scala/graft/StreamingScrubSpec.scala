package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{LlmPrep, LlmText}
import graft.streaming.StreamingScrub

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class ScrubDoc(doc_id: Long, text: String)

/** Stream/batch parity for the ingest cleaning stage: the scrub and
  * screen operators applied to a stream, and the composed per-batch
  * gate, must equal the batch composition on any batch split. */
class StreamingScrubSpec extends GraftSuite {
  import spark.implicits._

  /** Even ids: 20 distinct tokens — clear every screen. Odd ids:
    * one-word spam — trip the top-word screen. PII classes (mod 5)
    * cut across both, so passing docs with PII exist. */
  private def corpus(seed: Int): Seq[ScrubDoc] = {
    val rnd = new scala.util.Random(seed)
    (0L until 20L).map { id =>
      val text =
        if (id % 2 == 0) (0 until 20).map(i => s"w${id}_$i").mkString(" ")
        else Seq.fill(5 + rnd.nextInt(8))("spam").mkString(" ")
      ScrubDoc(id, text)
    }
  }

  test("streamed gate equals the batch composition across batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus(42).map(d =>
      ScrubDoc(d.doc_id, d.text)) // ids 0/1/2 mod 5 get PII injected
    val withPii = LlmPrep.withSyntheticPii(docs.toDF())
      .as[ScrubDoc].collect().toSeq
    val expected = StreamingScrub.gate(withPii.toDF())
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2))).toMap
    assert(expected.nonEmpty, "fixture sanity: some docs pass the gate")
    assert(expected.exists(_._2._2 == 1),
      "fixture sanity: some passing doc carried PII")

    val got = scala.collection.mutable.Map.empty[Long, (String, Int)]
    val input = MemoryStream[ScrubDoc]
    val query = StreamingScrub.start(input.toDF(),
      emit = out => out.collect().foreach(r =>
        got(r.getLong(0)) = (r.getString(1), r.getInt(2))))
    try {
      input.addData(withPii.take(7): _*)
      query.processAllAvailable()
      input.addData(withPii.drop(7): _*)
      query.processAllAvailable()
      assert(got.toMap == expected)
    } finally query.stop()
  }

  test("scrub and screen operators are streaming-safe unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val docs = LlmPrep.withSyntheticPii(corpus(7).toDF())
      .as[ScrubDoc].collect().toSeq
    val wantScrub = LlmPrep.piiScrub(docs.toDF()).collect()
      .map(_.toSeq).toSet
    val wantScreen = LlmText.repetition(docs.toDF()).collect()
      .map(_.toSeq).toSet
    val input = MemoryStream[ScrubDoc]
    val gotScrub = scala.collection.mutable.Set.empty[Seq[Any]]
    val gotScreen = scala.collection.mutable.Set.empty[Seq[Any]]
    val q1 = StreamingScrub.scrubbed(input.toDF()).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => { gotScrub += r.toSeq; () })
      }.start()
    val q2 = StreamingScrub.screened(input.toDF()).writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => { gotScreen += r.toSeq; () })
      }.start()
    try {
      input.addData(docs: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(gotScrub.toSet == wantScrub)
      assert(gotScreen.toSet == wantScreen)
    } finally { q1.stop(); q2.stop() }
  }
}
