package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.operators.LlmIngest

/** Incremental ingest dedup: accept/reject across batches, index
  * growth, idempotent re-ingest. */
class LlmIngestSpec extends GraftSuite {
  import spark.implicits._

  // ~40 tokens so the 3-gram shingle sets are rich; the near-dup edit
  // (one token changed) keeps Jaccard (and its MinHash estimate) high
  private val baseText = (1 to 40).map(i => s"w$i").mkString(" ")
  private val nearDup = ((1 to 39).map(i => s"w$i") :+ "zz").mkString(" ")
  private val other =
    (1 to 40).map(i => s"v$i").mkString(" ")

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def freshIndex(): String =
    Files.createTempDirectory("ingest_idx").resolve("index").toString

  test("first batch creates the index and accepts everything distinct") {
    val idx = freshIndex()
    val a = LlmIngest.ingestDedup(spark, docs(1L -> baseText, 2L -> other),
      idx)
    assert(a.select("doc_id").as[Long].collect().sorted === Seq(1L, 2L))
    assert(new java.io.File(idx).exists())
  }

  test("later batch: near-dup of an indexed doc rejected, new doc kept") {
    val idx = freshIndex()
    LlmIngest.ingestDedup(spark, docs(1L -> baseText), idx)
    val a = LlmIngest.ingestDedup(spark,
      docs(11L -> nearDup, 12L -> other), idx)
      .select("doc_id").as[Long].collect().sorted
    assert(a === Seq(12L))
  }

  test("intra-batch near-dups: smaller id wins, larger rejected") {
    val idx = freshIndex()
    val a = LlmIngest.ingestDedup(spark,
      docs(5L -> baseText, 6L -> nearDup, 7L -> other), idx)
      .select("doc_id").as[Long].collect().sorted
    assert(a === Seq(5L, 7L))
  }

  test("re-ingesting the same batch is a no-op (idempotent index)") {
    val idx = freshIndex()
    val batch = docs(1L -> baseText, 2L -> other)
    val first = LlmIngest.ingestDedup(spark, batch, idx)
      .select("doc_id").as[Long].collect().sorted
    val indexRows = spark.read.parquet(idx).count()
    val again = LlmIngest.ingestDedup(spark, batch, idx)
      .select("doc_id").as[Long].collect().sorted
    assert(first === Seq(1L, 2L))
    assert(again === first, "second ingest accepts the same set")
    assert(spark.read.parquet(idx).count() === indexRows,
      "index unchanged by the re-ingest")
  }

  test("unrelated docs never collide: index grows by each batch") {
    val idx = freshIndex()
    LlmIngest.ingestDedup(spark, docs(1L -> baseText), idx)
    LlmIngest.ingestDedup(spark, docs(2L -> other), idx)
    // one row per (band key, doc) — NumBands rows per accepted doc
    assert(spark.read.parquet(idx).count() ===
      2L * graft.operators.LlmText.NumBands)
  }

  // ---- vector ingest ----

  private val baseVec = Array(1.0f, 1.0f, 1.0f, 1.0f)
  private val nearVec = Array(1.0f, 1.0f, 1.0f, 0.9f)  // cos ≈ 0.999
  private val otherVec = Array(1.0f, -1.0f, 1.0f, -1.0f)

  private def vecs(rows: (Long, Array[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def ingestV(batch: DataFrame, idx: String): Seq[Long] =
    LlmIngest.ingestVectors(spark, batch, idx, threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq

  test("vector ingest: first batch accepts all distinct vectors") {
    val idx = freshIndex()
    assert(ingestV(vecs(1L -> baseVec, 2L -> otherVec), idx) ==
      Seq(1L, 2L))
    assert(spark.read.parquet(idx).count() === 2L)
  }

  test("vector ingest: near-dup of an indexed vector rejected") {
    val idx = freshIndex()
    ingestV(vecs(1L -> baseVec), idx)
    assert(ingestV(vecs(11L -> nearVec, 12L -> otherVec), idx) ==
      Seq(12L))
  }

  test("vector ingest: intra-batch near-dups keep the smaller id") {
    val idx = freshIndex()
    assert(ingestV(vecs(5L -> baseVec, 6L -> nearVec, 7L -> otherVec),
      idx) == Seq(5L, 7L))
  }

  test("vector ingest: re-ingest is a no-op on result and index") {
    val idx = freshIndex()
    val batch = vecs(1L -> baseVec, 2L -> otherVec)
    val first = ingestV(batch, idx)
    val rows = spark.read.parquet(idx).count()
    assert(ingestV(batch, idx) == first)
    assert(spark.read.parquet(idx).count() === rows)
  }

  test("vector ingest: cell-boundary near-dup slips through (contract)") {
    // near-identical by cosine but in different sign cells — the
    // documented throughput-vs-recall trade the scaladoc names
    // (contaminationEmbed is the exact screen for recall-critical use)
    val idx = freshIndex()
    ingestV(vecs(1L -> Array(0.001f, 1.0f, 1.0f, 1.0f)), idx)
    assert(ingestV(vecs(2L -> Array(-0.001f, 1.0f, 1.0f, 1.0f)), idx) ==
      Seq(2L))
  }
}
