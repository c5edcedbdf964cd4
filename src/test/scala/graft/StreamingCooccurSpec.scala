package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{ClassicQueries, CooccurIngest}
import graft.streaming.StreamingCooccur

/** One streamed (user, item) interaction — top-level for the
  * encoder. */
case class UiRow(user_id: Long, item: Long)

/** Incremental co-occurrence ≡ the batch [[ClassicQueries
  * .itemCooccur]] over everything ingested so far: random chops,
  * duplicate redelivery, a replayed batch id, and a checkpoint
  * restart all land on the same state. */
class StreamingCooccurSpec extends GraftSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    Files.createTempDirectory("stream_cooc").resolve(name).toString

  /** The fixture's (user, item) rows — the same extraction the batch
    * operator runs. */
  private def uiRows: Seq[UiRow] = graft.sources.Tables.events(spark, dir)
    .filter(col("user_id").isNotNull && col("props").isNotNull)
    .select(col("user_id"),
      expr("from_json(props, 'k BIGINT')").getField("k").as("item"))
    .filter(col("item").isNotNull)
    .as[(Long, Long)].collect().map((UiRow.apply _).tupled).toSeq

  private def want: Set[(Long, Long, Long, Double)] =
    ClassicQueries.itemCooccur(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet

  private def got(path: String): Set[(Long, Long, Long, Double)] =
    CooccurIngest.view(spark, path)
      .as[(Long, Long, Long, Double)].collect().toSet

  private def chop[T](rows: Seq[T], seed: Int): Seq[Seq[T]] = {
    val rnd = new scala.util.Random(seed)
    var rest = rows
    val out = Seq.newBuilder[Seq[T]]
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(math.max(1, rest.size / 4))
      out += rest.take(take)
      rest = rest.drop(take)
    }
    out.result()
  }

  test("streamed chops (with duplicate redelivery) ≡ batch itemCooccur") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("cooc")
    val rows = uiRows
    // redeliver a slice of earlier rows mid-stream: distinct
    // (user, item) semantics must absorb them
    val batches = chop(rows, 31)
    val withDup = batches.take(2) ++ Seq(rows.take(50)) ++ batches.drop(2)
    val input = MemoryStream[UiRow]
    val q = StreamingCooccur.start(input.toDS().toDF(), path,
      "user_id", "item")
    try {
      withDup.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(got(path) == want)
  }

  test("a replayed batch id is absorbed; checkpoint restart converges") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp("cooc_ckpt")
    val ckpt = tmp("ckpt")
    val rows = uiRows
    val batches = chop(rows, 47)
    val (a, b) = batches.splitAt(batches.size / 2)

    val input = MemoryStream[UiRow]
    val q1 = StreamingCooccur.start(input.toDS().toDF(), path,
      "user_id", "item", checkpoint = Some(ckpt))
    try {
      a.foreach { x => input.addData(x: _*); q1.processAllAvailable() }
    } finally q1.stop()

    // direct double-fold of one batch id: second call is a no-op
    val probe = rows.take(20).toDF("user_id", "item")
    CooccurIngest.ingest(spark, probe, path, "user_id", "item", "manual_1")
    val after1 = got(path)
    CooccurIngest.ingest(spark, probe, path, "user_id", "item", "manual_1")
    assert(got(path) == after1, "replayed batch id must be a no-op")

    val q2 = StreamingCooccur.start(input.toDS().toDF(), path,
      "user_id", "item", checkpoint = Some(ckpt))
    try {
      b.foreach { x => input.addData(x: _*); q2.processAllAvailable() }
    } finally q2.stop()
    assert(got(path) == want)
  }
}
