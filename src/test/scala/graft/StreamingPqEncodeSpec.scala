package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Pq
import graft.streaming.StreamingPqEncode

/** Top-level: Spark encoders cannot instantiate suite-inner classes. */
case class PqVec(vec_id: Long, embedding: Array[Float])

/** Streaming PQ encode against a frozen codebook: chop-parity with the
  * batch encode, replay idempotence, and the drift thermometer. */
class StreamingPqEncodeSpec extends GraftSuite {
  import spark.implicits._

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private def vecsOf(df: org.apache.spark.sql.DataFrame): Seq[PqVec] =
    df.as[PqVec].collect().toSeq

  private def freshPath(): String =
    Files.createTempDirectory("stream_pq").resolve("pq").toString

  /** Codebook frozen from the bootstrap corpus; later chops encode
    * against it — the steady-state production sequence. (The fixture
    * is tiny relative to the 256-cell codebooks, so the bootstrap is
    * the full corpus: freezing on a half would leave mostly singleton
    * cells, a near-zero overfit baseline, and a meaningless ratio —
    * at production scale cells hold millions of members each.) */
  test("streamed encode over chops equals the frozen-codebook batch " +
      "encode; codes table partitions by batch") {
    val path = freshPath()
    val s1 = embs.filter(col("vec_id") < 250)
    val s2 = embs.filter(col("vec_id") >= 250)
    Pq.freeze(spark, embs, path)
    val (cvsL, bbsL) = Pq.frozenCodebook(spark, path)
    val want = Pq.encodeFrozen(embs, cvsL, bbsL)
      .collect().map(_.toSeq).toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PqVec]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[Seq[Any]]
    val query = StreamingPqEncode.start(input.toDF(), path,
      emit = out => got ++= out
        .select("vec_id", "s", "code", "l2sq")
        .collect().map(_.toSeq))
    try {
      input.addData(vecsOf(s1): _*)
      query.processAllAvailable()
      input.addData(vecsOf(s2): _*)
      query.processAllAvailable()
    } finally query.stop()

    assert(got.toSet === want, "emitted codes equal the batch encode")
    val table = spark.read.parquet(s"$path/codes")
    assert(table.select("vec_id", "s", "code", "l2sq")
      .collect().map(_.toSeq).toSet === want)
    assert(table.select("batch_id").distinct().count() == 2)
    val drift = spark.read.parquet(s"$path/drift")
    assert(drift.count() == 2)
    // same distribution as the bootstrap: no retrain flag
    assert(drift.filter(col("retrain") === 1).count() == 0)
  }

  test("replaying an applied batch is a no-op: identical table, " +
      "identical emitted rows") {
    val path = freshPath()
    Pq.freeze(spark, embs, path)
    val batch = embs.filter(col("vec_id") < 100)
    val first = StreamingPqEncode.applyBatch(spark, batch, path, 0L)
      .collect().map(_.toSeq).toSet
    val again = StreamingPqEncode.applyBatch(spark, batch, path, 0L)
      .collect().map(_.toSeq).toSet
    assert(first === again)
    assert(spark.read.parquet(s"$path/codes")
      .groupBy("vec_id", "s").count()
      .filter(col("count") =!= 1).count() == 0,
      "no duplicated (vec, subspace) rows after replay")
  }

  test("searchIndex over the streamed codes table equals the batch " +
      "ADC search on the same corpus") {
    val path = freshPath()
    Pq.freeze(spark, embs, path)
    // build the index in two streamed chops
    StreamingPqEncode.applyBatch(spark,
      embs.filter(col("vec_id") < 250), path, 0L)
    StreamingPqEncode.applyBatch(spark,
      embs.filter(col("vec_id") >= 250), path, 1L)
    val queries = embs.filter(
      col("vec_id") % graft.operators.LlmSim.QueryMod === 0)
    val got = Pq.searchIndex(spark, queries, path)
      .collect().map(_.toSeq).toSet
    val want = Pq.search(embs).collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("streamed IVF-PQ index (codes + coarse cells per batch) serves " +
      "searchIvfIndex identically to the batch searchIvf, across " +
      "chops, a replay, and a mid-batch crash window") {
    val path = freshPath()
    Pq.freeze(spark, embs, path)
    StreamingPqEncode.applyBatch(spark,
      embs.filter(col("vec_id") < 250), path, 0L)
    StreamingPqEncode.applyBatch(spark,
      embs.filter(col("vec_id") >= 250), path, 1L)
    // crash window: batch 1 died AFTER the codes write but BEFORE the
    // cells write and the marker — wipe cells + marker and replay; the
    // redo must overwrite both directories back to a complete state
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/cells/batch_id=1"), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$path/_applied/pqenc_1"), false)
    StreamingPqEncode.applyBatch(spark,
      embs.filter(col("vec_id") >= 250), path, 1L)
    // an already-applied batch replayed once more: still a no-op
    StreamingPqEncode.applyBatch(spark,
      embs.filter(col("vec_id") < 250), path, 0L)
    val cells = spark.read.parquet(s"$path/cells")
    assert(cells.count() == embs.count())
    assert(cells.groupBy("vec_id").count()
      .filter(col("count") =!= 1).count() == 0,
      "exactly one coarse cell per stored vector")
    val queries = embs.filter(
      col("vec_id") % graft.operators.LlmSim.QueryMod === 0)
    val got = Pq.searchIvfIndex(spark, queries, path)
      .collect().map(_.toSeq).toSet
    val want = Pq.searchIvf(embs).collect().map(_.toSeq).toSet
    assert(got === want,
      "stored-index IVF-PQ must equal the batch searchIvf")
  }

  test("a drifted batch raises the reconstruction-error ratio and " +
      "trips the retrain flag; an in-distribution batch does not") {
    val path = freshPath()
    Pq.freeze(spark, embs, path)
    val inDist = embs.filter(col("vec_id") >= 250)
    StreamingPqEncode.applyBatch(spark, inDist, path, 0L)
    // drifted: every dim shifted — the codebook was trained on
    // zero-centered data, so reconstruction error must rise
    val drifted = embs.filter(col("vec_id") >= 250)
      .select(col("vec_id") + 1000000L as "vec_id",
        transform(col("embedding"), x => x + lit(0.6f)).as("embedding"))
    StreamingPqEncode.applyBatch(spark, drifted, path, 1L,
      retrainRatio = 1.2)
    val drift = spark.read.parquet(s"$path/drift")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .collect().map(r => r.getAs[Long]("batch_id") ->
        ((r.getAs[Double]("drift_ratio"), r.getAs[Int]("retrain"))))
      .toMap
    assert(drift(0L)._1 < 1.2, s"in-distribution ratio ${drift(0L)._1}")
    assert(drift(0L)._2 == 0)
    assert(drift(1L)._1 > 1.2, s"drifted ratio ${drift(1L)._1}")
    assert(drift(1L)._2 == 1)
  }
}
