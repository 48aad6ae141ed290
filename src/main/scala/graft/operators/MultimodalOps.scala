package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing for an LLM-data pipeline: media
  * (image/audio/video) travels as an opaque `BinaryType` payload column
  * next to typed metadata, and per-item decode/feature-extract runs
  * batch-local inside the executors via `mapPartitions` — never a
  * driver round-trip.
  *
  * The container has no media codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[decodeImageStub]]) — the parts
  * that matter at 100 TB are real and tested: the schema contract
  * (payload + metadata struct), the partition-local batch shape, and
  * the scan-level behavior (payload bytes are only read when the
  * decode column is referenced — parquet column pruning drops them
  * otherwise, which is why payloads must live in their own column, not
  * inside a struct with hot metadata).
  */
object MultimodalOps {

  /** Attach an opaque binary payload (UTF-8 bytes of `text` stand in
    * for media bytes) + extract byte-level metadata. The metadata
    * query is the oracle-checked surface: byte length + content md5.
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documentsFanned(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS content_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Decoded-image metadata record (what a real decoder would emit). */
  case class ImageMeta(doc_id: Long, width: Int, height: Int,
                       channels: Int, n_pixels: Long)

  /** STUB image decode: a real pipeline calls an image codec here
    * (per-partition, reusing a decoder instance across the batch); this
    * container has none, so dimensions are derived deterministically
    * from the payload's leading bytes. The mapPartitions shape — typed
    * iterator in, typed iterator out, no per-row driver interaction,
    * schema known statically — is exactly the production pattern.
    */
  def decodeImageStub(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // (a real decoder would be instantiated once per partition here)
        it.map { case (id, bytes) =>
          val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
          val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
          val w = 16 + (b0 % 64)
          val h = 16 + (b1 % 64)
          ImageMeta(id, w, h, 3, w.toLong * h * 3)
        }
      }
      .toDF()
  }

  /** Frame-sample plumbing: given per-item frame counts, emit (item,
    * frame_idx) rows for every k-th frame — the explode-side of a video
    * pipeline (decode of each sampled frame would follow per partition).
    */
  def sampleFrames(df: DataFrame, frameCountCol: String, every: Int): DataFrame =
    df.withColumn("frame_idx",
      // zero-frame items contribute NO rows (explode drops empty arrays)
      explode(when(col(frameCountCol) > 0,
        sequence(lit(0), col(frameCountCol) - 1, lit(every)))
        .otherwise(array())))

  /** STUB feature extraction: payload bytes → fixed-`dim` float vector,
    * the shape that feeds [[SimilarityOps]]' ANN/dedup operators. A real
    * pipeline loads a vision/audio encoder ONCE per partition and runs
    * batched inference over the iterator; the stub derives a
    * deterministic pseudo-embedding from the payload hash so everything
    * around the model call is real and testable: the schema contract
    * (`item_id`, `feature: array<float>` of static length), the
    * partition-local init point, one output row per item, no driver
    * round-trips.
    */
  def extractFeaturesStub(payloads: DataFrame, dim: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // (a real encoder loads here — once per partition, not per row)
        it.map { case (id, bytes) =>
          val rnd = new scala.util.Random(java.util.Arrays.hashCode(bytes))
          (id, Array.fill(dim)(rnd.nextFloat()))
        }
      }
      .toDF("item_id", "feature")
  }
}
