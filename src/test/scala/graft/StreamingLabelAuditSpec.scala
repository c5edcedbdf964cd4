package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.LlmSim
import graft.streaming.StreamingLabelAudit

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class AuditVec(vec_id: Long, embedding: Array[Float], label: Int)

/** Stream-static label-audit parity with the batch screen. */
class StreamingLabelAuditSpec extends GraftSuite {
  import spark.implicits._

  private def run(corpus: Seq[AuditVec],
      batches: Seq[Seq[AuditVec]]): Map[Long, (Int, Int, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val index = StreamingLabelAudit.refIndex(corpus.toDF())
    val got = scala.collection.mutable.Map.empty[Long, (Int, Int, Boolean)]
    val input = MemoryStream[AuditVec]
    val query = StreamingLabelAudit.start(input.toDF(), index,
      emit = v => v.collect().foreach(r =>
        got(r.getLong(0)) = (r.getInt(1), r.getInt(2), r.getBoolean(3))))
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        query.processAllAvailable()
      }
    } finally query.stop()
    got.toMap
  }

  test("streamed self-screen equals the batch operator across splits") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.collect().map(r => AuditVec(r.getAs[Long]("vec_id"),
      r.getAs[Seq[Float]]("embedding").toArray, r.getAs[Int]("label")))
      .toSeq
    val expected = LlmSim.labelNoise(emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(expected.nonEmpty, "fixture sanity")
    val rnd = new scala.util.Random(42)
    // arbitrary batch boundaries: each vector's verdict is complete in
    // its own batch, so the chop must not matter
    var rest = corpus
    val batches = Seq.newBuilder[Seq[AuditVec]]
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(math.max(1, rest.size / 2))
      batches += rest.take(take)
      rest = rest.drop(take)
    }
    assert(run(corpus, batches.result()) == expected)
  }

  test("a planted mislabel is flagged the moment its batch lands") {
    val ref = Seq(
      AuditVec(1L, Array(1.0f, 0.01f, 0f, 0f), 1),
      AuditVec(2L, Array(1.0f, 0.02f, 0f, 0f), 1),
      AuditVec(10L, Array(-1.0f, 0.01f, 0f, 0f), 2))
    implicit val sqlCtx = spark.sqlContext
    val index = StreamingLabelAudit.refIndex(ref.toDF())
    val got = scala.collection.mutable.Map.empty[Long, (Int, Boolean)]
    val input = MemoryStream[AuditVec]
    val query = StreamingLabelAudit.start(input.toDF(), index,
      emit = v => v.collect().foreach(r =>
        got(r.getLong(0)) = (r.getInt(2), r.getBoolean(3))))
    try {
      input.addData(AuditVec(100L, Array(1.0f, 0.015f, 0f, 0f), 9))
      query.processAllAvailable()
      assert(got(100L) == (1, false), "suspect flagged on arrival")
      input.addData(AuditVec(101L, Array(-1.0f, 0.02f, 0f, 0f), 2))
      query.processAllAvailable()
      assert(got(101L) == (2, true))
    } finally query.stop()
  }
}
