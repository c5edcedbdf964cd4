package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.LlmPrep
import graft.streaming.StreamingRecrawl
import graft.streaming.StreamingRecrawl.{FetchIn, FetchOut}

/** [[StreamingRecrawl]] ≡ batch [[LlmPrep.recrawlDedup]] over the
  * union of micro-batches (time-ordered arrival per key), including
  * the cross-batch case where the predecessor that suppresses a fetch
  * was itself dropped in an earlier batch. */
class StreamingRecrawlSpec extends GraftSuite {
  import spark.implicits._

  // (key, id, seconds) — key k1 exercises the chain rule across the
  // batch boundary: id=3 at t=20 is >15s after the KEPT id=1 (t=0) but
  // only 10s after the DROPPED id=2 (t=10) -> must stay dropped even
  // when id=2 arrived in a previous micro-batch
  private val fetches = Seq(
    ("k1", 1L, 0L), ("k1", 2L, 10L),
    ("k1", 3L, 20L), ("k1", 4L, 40L),
    ("k2", 5L, 5L), ("k2", 6L, 100L))

  private def batchKept: Set[Long] = {
    val df = fetches.map { case (k, id, s) =>
      (k, id, new Timestamp(s * 1000L))
    }.toDF("key", "id", "t")
    LlmPrep.recrawlDedup(df, Seq("key"), "t", "id", 15L)
      .select("id").as[Long].collect().toSet
  }

  private def streamedKept(chops: Seq[Seq[(String, Long, Long)]])
      : Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchIn]
    val name = s"recrawl_out_${System.nanoTime()}"
    val q = StreamingRecrawl(input.toDS(), 15L)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try chops.foreach { c =>
      input.addData(c.map { case (k, id, s) =>
        FetchIn(k, id, s * 1000000L)
      })
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[FetchOut].collect().map(_.id).toSet
  }

  test("streamed ≡ batch, suppressor dropped in an earlier batch") {
    val expected = batchKept
    assert(expected == Set(1L, 4L, 5L, 6L)) // fixture sanity
    val got = streamedKept(Seq(fetches.take(2), fetches.slice(2, 4),
      fetches.drop(4)))
    assert(got == expected)
  }

  test("single batch ≡ batch; within-batch ties sort by id") {
    val tied = Seq(("k", 2L, 0L), ("k", 1L, 0L), ("k", 3L, 30L))
    val got = streamedKept(Seq(tied))
    assert(got == Set(1L, 3L))
  }

  test("every chop split yields the same kept set") {
    val expected = batchKept
    for (cut <- 1 until fetches.size) {
      val got = streamedKept(Seq(fetches.take(cut), fetches.drop(cut)))
      assert(got == expected, s"cut=$cut")
    }
  }
}
