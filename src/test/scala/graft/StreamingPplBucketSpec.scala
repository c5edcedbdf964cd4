package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.LlmCorpus
import graft.streaming.StreamingPplBucket

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class PbDoc(doc_id: Long, lang: String, text: String)

/** Stream-static perplexity-bucketing parity: streamed buckets against
  * a frozen reference-corpus LM + cutoffs equal the batch kernels run
  * over the whole stream at once, regardless of batch boundaries. */
class StreamingPplBucketSpec extends GraftSuite {
  import spark.implicits._

  private def mkDocs(rnd: scala.util.Random, n: Int,
      fromId: Long): Seq[PbDoc] = {
    val vocab = Vector("a", "b", "c", "dd", "ee", "fff")
    (0 until n).map { i =>
      val lang = rnd.nextInt(5) match {
        case 0 => null
        case 1 | 2 => "en"
        case _ => "de"
      }
      PbDoc(fromId + i, lang,
        Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
  }

  test("streamed buckets equal the batch kernels at any chop, " +
    "NULL-language docs included") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(83)
    val ref = mkDocs(rnd, 30, 0L).toDF()
    val arriving = mkDocs(rnd, 25, 1000L)
    val (cnt, stats, cuts) = StreamingPplBucket.index(ref)
    val got = scala.collection.mutable.Map.empty[Long, (String, String)]
    val input = MemoryStream[PbDoc]
    val query = StreamingPplBucket.start(input.toDF(), cnt, stats, cuts,
      emit = out => out.collect().foreach(r =>
        got(r.getAs[Long]("doc_id")) =
          ((r.getAs[String]("lang"), r.getAs[String]("bucket")))))
    try {
      var rest = arriving
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        input.addData(rest.take(take): _*)
        query.processAllAvailable()
        rest = rest.drop(take)
      }
      // batch comparand: same static LM + cutoffs over the whole
      // arriving set at once
      val allDf = arriving.toDF()
      val scored = allDf.select(col("doc_id"), col("lang"))
        .join(LlmCorpus.unigramScore(allDf, cnt, stats), Seq("doc_id"))
      val expected = LlmCorpus.bucketByCutoffs(scored, cuts).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("lang"), r.getAs[String]("bucket")))).toMap
      assert(expected.nonEmpty, "fixture sanity")
      assert(expected.keySet.exists(id =>
        expected(id)._1 == null), "fixture must exercise NULL lang")
      assert(got.toMap == expected)
      // every scoreable arriving doc got a bucket decision
      assert(got.keySet == arriving.map(_.doc_id).toSet)
      // frozen cutoffs mean buckets vary (not all one value)
      assert(got.values.map(_._2).toSet.size > 1)
    } finally query.stop()
  }

  test("a gibberish (all-OOV) document lands in the tail bucket") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val ref = mkDocs(rnd, 30, 0L).toDF()
    val (cnt, stats, cuts) = StreamingPplBucket.index(ref)
    val got = scala.collection.mutable.Map.empty[Long, String]
    val input = MemoryStream[PbDoc]
    val query = StreamingPplBucket.start(input.toDF(), cnt, stats, cuts,
      emit = out => out.collect().foreach(r =>
        got(r.getAs[Long]("doc_id")) = r.getAs[String]("bucket")))
    try {
      input.addData(PbDoc(500L, "en", "zzz yyy xxx www zzz"))
      query.processAllAvailable()
      assert(got(500L) == "tail",
        "pure-OOV perplexity must exceed the frozen p67 cutoff")
    } finally query.stop()
  }
}
