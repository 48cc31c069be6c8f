package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, processed by a batched per-partition
  * decode stage — the Scala analog of a `mapInPandas` pipeline
  * (Iterator-of-batches in, Iterator-of-rows out; explicit schema via
  * Encoders; partitioning preserved, no shuffle).
  *
  * The decode itself is a clearly-marked STUB (no image/audio codecs in
  * this environment): it derives deterministic pseudo-features from a
  * SHA-256 of the bytes, so the Spark-side contract — schema, batch
  * shape, typed boundaries, determinism — is real and testable while
  * the codec call is swappable.
  */
object Multimodal {

  /** A media row: id + raw bytes + mime hint. */
  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features: fake "dimensions" + an 8-dim float feature. */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_bytes: Int, feat: Array[Float])

  /** STUB decode — replace with a real codec (e.g. javacv / a JNI
    * decoder) in production. Deterministic: features are a pure
    * function of the bytes. */
  private def stubDecode(row: MediaRow): MediaFeatures = {
    val digest = MessageDigest.getInstance("SHA-256").digest(row.media)
    def b(i: Int): Int = digest(i) & 0xff
    MediaFeatures(
      doc_id = row.doc_id,
      width = 16 + (b(0) << 4 | b(1) >> 4),   // ??? stub: real decode would parse the header
      height = 16 + (b(2) << 4 | b(3) >> 4),
      n_bytes = row.media.length,
      feat = Array.tabulate(8)(i => b(8 + i) / 255.0f))
  }

  /** Batched per-partition feature extraction. `batchSize` mirrors the
    * arrow-batch knob of a Pandas-UDF pipeline: the stub processes one
    * row at a time, but a real codec would amortize model/codec init
    * across each batch. */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: decode the whole batch against one codec instance
        batch.iterator.map(stubDecode)
      }
    }
  }

  /** q_multimodal_features: documents.text bytes stand in for media
    * blobs; binary column + metadata in, typed features out.
    * Oracle-exempt (JVM SHA-256-derived stub); golden-tested for
    * determinism and schema. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"),
              encode(col("text"), "UTF-8").as("media"),
              lit("text/plain").as("mime"))
      .as[MediaRow]
    decodeFeatures(media)
      .toDF()
      .orderBy("doc_id")
  }
}
