package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling — LLM-pipeline extension (SURVEY §2.B).
  *
  * Media (image/audio/video) is carried as an opaque `BINARY` column
  * plus a typed metadata struct; decode / feature-extraction runs as a
  * batched per-partition pass (`mapPartitions`), which is the Scala
  * analogue of a Pandas-UDF/`mapInArrow` decoder: executors stream
  * batches of payloads through a columnar decode kernel without ever
  * collecting to the driver, and the output is a fixed, declared schema
  * that Catalyst can prune/push through.
  *
  * STUB: the codec itself. This container has no image/audio libraries,
  * so `decodeBatch` computes a deterministic fake "decode" (byte stats →
  * synthetic dimensions). The Spark-side plumbing — binary schema,
  * typed metadata, batching shape, partition-parallel execution, typed
  * output Encoder — is real and tested; swapping `decodeBatch`'s body
  * for a JNI/FFI codec call changes nothing else.
  */
object Multimodal {

  /** Typed decode output — the declared schema of the "decoder". */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
      fake_width: Long, fake_height: Long)

  /** Documents as an opaque-media table: (doc_id, media BINARY,
    * meta STRUCT<mime, n_bytes>). In a real pipeline `media` holds
    * image/audio bytes; here the text payload stands in. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** The batched decode kernel (STUB — see object doc). Deterministic:
    * byte_sum is the unsigned byte total; the fake dimensions derive
    * from it. One batch ≈ what a columnar decoder would receive. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val sum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
      MediaFeatures(id, bytes.length.toLong, sum, 16L + sum % 64, 16L + sum % 48)
    }

  /** q31 — decode/feature-extract over the media column. Batches of
    * `batchSize` payloads per call mirror a real decoder's batch shape;
    * partition-parallel, no driver round-trip. */
  def mediaFeatures(spark: SparkSession, docs: DataFrame, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] =
      mediaTable(docs).select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media
      .mapPartitions(_.grouped(batchSize).flatMap(b => decodeBatch(b.toSeq)))
      .toDF()
      .orderBy("doc_id")
  }
}
