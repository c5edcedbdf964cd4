package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media content as opaque `binary` columns
  * with typed metadata, plus the decode/feature-extract/frame-sample
  * stages a training-data pipeline runs over them.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked DETERMINISTIC FAKE — it "decodes" a media header out
  * of byte arithmetic. Everything around it is real and tested: the
  * schema (content + metadata struct), the partition-preserving
  * `mapPartitions` batch shape a native decoder would run in (one codec
  * init per partition, streaming over rows), and the declarative
  * column-level stage used when no per-row library call is needed.
  *
  * The `documents` table stands in for a media table: content =
  * UTF-8 bytes of `text`, modality assigned round-robin.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, modality: String,
      content: Array[Byte])
  case class MediaFeatures(doc_id: Long, modality: String, width: Int,
      height: Int, n_frames: Int, histogram: Array[Long],
      sampled_frames: Array[Int])

  /** Media view over `documents`: binary content + modality metadata. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").cast("binary").as("content"))

  /** ======= STUB ======= deterministic fake decode: a real deployment
    * replaces this body with the codec call (e.g. JNI image decode).
    * Derives fake dimensions/frame-count from content length only. */
  def decodeStub(m: MediaRecord): (Int, Int, Int) = {
    val n = m.content.length
    (n % 64 + 16, n % 48 + 16, n % 7 + 1)
  }

  /** Feature extraction over media partitions: the `mapPartitions`
    * shape keeps one decoder instance per partition and streams rows —
    * the Scala-Spark analogue of a pandas-batch UDF. Histogram bins =
    * top-2 bits of each byte (real); frame sampling = every k-th fake
    * frame index (real logic over stubbed n_frames). */
  def extractFeatures(media: Dataset[MediaRecord])
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (a real decoder would be initialized once per partition here)
      rows.map { m =>
        val (w, h, frames) = decodeStub(m)
        val hist = new Array[Long](4)
        m.content.foreach(b => hist((b & 0xff) >> 6) += 1)
        val sampled = (0 until frames by 2).toArray
        MediaFeatures(m.doc_id, m.modality, w, h, frames, hist, sampled)
      }
    }
  }

  /** Declarative metadata stage (oracle-checked): byte length, header
    * hex, and the same stubbed dimension arithmetic as [[decodeStub]] —
    * pure column ops, no per-row code. */
  def mediaStats(documents: DataFrame): DataFrame =
    mediaTable(documents)
      .withColumn("n_bytes", length(col("content")).cast("long"))
      .select(col("doc_id"), col("modality"), col("n_bytes"),
        substring(hex(col("content")), 1, 16).as("header_hex"),
        (col("n_bytes") % 64 + 16).as("width"),
        (col("n_bytes") % 48 + 16).as("height"),
        (col("n_bytes") % 7 + 1).as("n_frames"))

  def mediaDataset(spark: SparkSession, documents: DataFrame)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(documents).as[MediaRecord]
  }

  /** Resize stage: same partition-preserving typed shape as
    * [[extractFeatures]]; the pixel resampling itself is the stub —
    * a deterministic byte stride to `targetBytes` stands in for the
    * codec's scaler, while the pipeline-visible contract (binary in,
    * smaller binary out, metadata preserved, bounded output size) is
    * real and asserted by MultimodalSpec. */
  def resize(media: Dataset[MediaRecord], targetBytes: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.content.length <= targetBytes) m
        else {
          val stride = m.content.length.toDouble / targetBytes
          val out = Array.tabulate(targetBytes)(i =>
            m.content((i * stride).toInt))
          MediaRecord(m.doc_id, m.modality, out)
        }
      }
    }
  }
}

/** DuckDB twin of [[Multimodal.mediaStats]]. */
object MultimodalSql {
  val mediaStatsSql: String =
    """WITH m AS (SELECT doc_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
          AS modality,
        encode(text) AS content
      FROM documents)
    SELECT doc_id, modality,
      CAST(octet_length(content) AS BIGINT) AS n_bytes,
      substr(hex(content), 1, 16) AS header_hex,
      CAST(octet_length(content) AS BIGINT) % 64 + 16 AS width,
      CAST(octet_length(content) AS BIGINT) % 48 + 16 AS height,
      CAST(octet_length(content) AS BIGINT) % 7 + 1 AS n_frames
    FROM m"""
}
