package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.QualityChecks
import graft.operators.QualityChecks._
import graft.streaming.StreamingQualityAudit

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class QaRow(id: Long, key: String, qty: java.lang.Double,
  status: String, fk: java.lang.Long)

/** [[StreamingQualityAudit]] ≡ the batch audit over the union of all
  * batches — including cross-batch duplicates (the non-additive check)
  * and referential integrity against a pinned dimension — plus shard
  * redelivery and unique-ledger replay idempotence. */
class StreamingQualityAuditSpec extends GraftSuite {
  import spark.implicits._

  private val checks = Seq(
    NotNull("qty"), InRange("qty", 0.0, 50.0),
    AcceptedValues("status", Seq("A", "B")))

  private def rows: Seq[QaRow] = Seq(
    QaRow(1L, "k1", 5.0, "A", 10L),
    QaRow(2L, "k1", -3.0, "B", 10L),   // dup key (cross-batch), range
    QaRow(3L, "k2", 99.0, "Z", 99L),   // range, status, orphan fk
    QaRow(4L, null, null, "A", 20L),   // null qty; null key excluded
    QaRow(5L, "k3", 7.0, null, null),  // null status ok, null fk ok
    QaRow(6L, "k1", 1.0, "B", 20L),    // dup key again
    QaRow(7L, "k4", 2.0, "A", 10L)
  )

  private def dim = Seq(10L, 20L, 20L).toDF("pk") // dup parent keys

  private def batchReport(df: DataFrame): Seq[(String, String, String, Long, Long, Boolean)] =
    QualityChecks.report(
        QualityChecks.audit(df, "t", checks :+ Unique(Seq("key"))),
        QualityChecks.refIntegrity(df, "t", "fk", dim, "dim", "pk"))
      .as[(String, String, String, Long, Long, Boolean)].collect().toSeq

  private def streamedReport(chops: Seq[Seq[QaRow]], dir: String)
      : Seq[(String, String, String, Long, Long, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[QaRow]
    val q = StreamingQualityAudit.start(input.toDF(), dir, "t", checks,
      uniqueKey = Seq("key"),
      refs = Seq(("fk", dim, "dim", "pk")))
    try chops.foreach { c =>
      input.addData(c: _*)
      q.processAllAvailable()
    } finally q.stop()
    StreamingQualityAudit.currentReport(spark, dir, Seq("key"))
      .as[(String, String, String, Long, Long, Boolean)].collect().toSeq
  }

  test("streamed ≡ batch across chops, duplicates split across batches") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqa").toString
    val expected = batchReport(rows.toDF())
    // k1's three occurrences land in three different batches: only the
    // maintained state can see them as duplicates
    val got = streamedReport(Seq(rows.take(2), rows.slice(2, 5),
      rows.drop(5)), dir)
    assert(got == expected, s"\ngot: $got\nexp: $expected")
    // sanity: the fixture actually exercises every check
    assert(expected.count(!_._6) >= 4)
  }

  test("single-batch stream ≡ batch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqa1").toString
    assert(streamedReport(Seq(rows), dir) == batchReport(rows.toDF()))
  }

  test("shard redelivery replaces; unique ledger replay is a no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sqa_replay").toString
    val (a, b) = rows.splitAt(4)
    StreamingQualityAudit.writeShard(a.toDF(), dir, "t", checks, Nil, 0L)
    StreamingQualityAudit.writeShard(b.toDF(), dir, "t", checks, Nil, 1L)
    StreamingQualityAudit.maintainUnique(a.toDF(), dir, Seq("key"), "e0")
    StreamingQualityAudit.maintainUnique(b.toDF(), dir, Seq("key"), "e1")
    val before = StreamingQualityAudit
      .currentReport(spark, dir, Seq("key")).collect().toSeq
    // redeliver both: shard 1 overwritten, ledger id e1 already applied
    StreamingQualityAudit.writeShard(b.toDF(), dir, "t", checks, Nil, 1L)
    StreamingQualityAudit.maintainUnique(b.toDF(), dir, Seq("key"), "e1")
    val after = StreamingQualityAudit
      .currentReport(spark, dir, Seq("key")).collect().toSeq
    assert(after == before)
  }
}
