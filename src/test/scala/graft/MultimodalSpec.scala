package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The multimodal plumbing around the stubbed decode: schema, batch
  * shape, feature determinism. */
class MultimodalSpec extends GraftSuite {
  import spark.implicits._

  private val docs = Seq(
    (0L, "aaaaaaaaAAAA"),     // 12 bytes
    (1L, "zz"),
    (2L, "hello world, multimodal bytes")).toDF("doc_id", "text")

  test("media table carries binary content + modality metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("content").dataType.typeName == "binary")
    val mods = byKey(m, "doc_id", "modality")
    assert(mods == Map("0" -> "image", "1" -> "audio", "2" -> "video"))
  }

  test("mapPartitions feature extraction: histogram + stub dimensions") {
    val feats = Multimodal
      .extractFeatures(Multimodal.mediaDataset(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    val f0 = feats(0L)
    // "aaaaaaaaAAAA": 'a'=0x61 (bin 1), 'A'=0x41 (bin 1) -> all 12 in bin 1
    assert(f0.histogram.toSeq == Seq(0L, 12L, 0L, 0L))
    assert(f0.width == 12 % 64 + 16 && f0.height == 12 % 48 + 16)
    assert(f0.n_frames == 12 % 7 + 1)
    assert(f0.sampled_frames.toSeq == (0 until f0.n_frames by 2).toSeq)
    // deterministic across runs
    val again = Multimodal
      .extractFeatures(Multimodal.mediaDataset(spark, docs))
      .collect().map(f => f.doc_id -> f.histogram.toSeq).toMap
    assert(again(2L) == feats(2L).histogram.toSeq)
  }

  test("resize bounds content size, preserves metadata and small rows") {
    val m = Multimodal.mediaDataset(spark, docs)
    val out = Multimodal.resize(m, 8).collect().map(r => r.doc_id -> r).toMap
    assert(out(0L).content.length == 8) // 12 bytes → resampled to 8
    assert(out(1L).content.sameElements("zz".getBytes)) // under target
    assert(out(2L).content.length == 8)
    assert(out(0L).modality ==
      Multimodal.mediaDataset(spark, docs).collect()
        .find(_.doc_id == 0L).get.modality)
    // deterministic stride: first byte survives
    assert(out(2L).content(0) == 'h'.toByte)
  }

  test("partition count is preserved (one decoder init per partition)") {
    val ds = Multimodal.mediaDataset(spark, docs).repartition(3)
    assert(Multimodal.extractFeatures(ds).rdd.getNumPartitions == 3)
  }
}
