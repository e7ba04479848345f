package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

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
  * The codec is a REAL pure-JVM binary format: PPM "P6" (the simplest
  * image container — ASCII header `P6 <w> <h> <maxval>` + raw payload).
  * `mediaTable` ENCODES each document into a well-formed PPM whose
  * dimensions derive deterministically from the payload bytes, and
  * `decodeBatch` DECODES by parsing the binary header alone (comments
  * and whitespace per the PPM grammar) — it never sees the source text.
  * The DuckDB oracle recomputes the same dimensions from the text side,
  * so q31 verifies the whole encode → binary → parse round trip.
  * Swapping the kernel for a JNI/FFI JPEG codec changes nothing else.
  */
object Multimodal {

  /** Typed decode output — the declared schema of the decoder. Width
    * and height come from the PARSED binary header; n_bytes/byte_sum
    * are payload (pixel-data) stats. Malformed payloads yield the
    * sentinel row (-1 dims) rather than failing the batch — at 100 TB
    * a poison payload must not kill the stage. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
      fake_width: Long, fake_height: Long)

  private def unsignedSum(bytes: Array[Byte], from: Int): Long = {
    var acc = 0L; var i = from
    while (i < bytes.length) { acc += (bytes(i) & 0xff); i += 1 }
    acc
  }

  /** Build a well-formed binary PPM (P6) around a payload: dimensions
    * are a deterministic function of the payload byte sum (the oracle
    * mirrors this arithmetic on the text side). */
  private[graft] def encodePpm(payload: Array[Byte]): Array[Byte] = {
    val sum = unsignedSum(payload, 0)
    val w = 16L + sum % 64
    val h = 16L + sum % 48
    val header = s"P6\n$w $h\n255\n".getBytes(US_ASCII)
    header ++ payload
  }

  /** Parse a PPM header per the grammar: magic "P6", then three ASCII
    * integers (width, height, maxval) separated by whitespace and
    * optional `#` comments, then ONE whitespace byte, then payload.
    * Returns (width, height, payloadOffset) or None if malformed. */
  private[graft] def parsePpmHeader(bytes: Array[Byte]): Option[(Long, Long, Int)] = {
    var i = 0
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val b = bytes(i)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else go = false
      }
    }
    def readInt(): Option[Long] = {
      skipWsAndComments()
      val start = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == start) None
      else Some(new String(bytes, start, i - start, US_ASCII).toLong)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if maxval > 0 && maxval < 65536 && i < bytes.length
    } yield {
      i += 1 // the single whitespace byte that terminates the header
      (w, h, i)
    }
  }

  /** Documents as an opaque-media table: (doc_id, media BINARY,
    * meta STRUCT<mime, n_bytes>). The media bytes are a genuine PPM
    * image wrapping the text payload; encode runs partition-parallel
    * through the same batch kernel shape as decode. */
  def mediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, encodePpm(text.getBytes(US_ASCII)))
      })
      .toDF("doc_id", "media")
      .select(
        col("doc_id"), col("media"),
        struct(
          lit("image/x-portable-pixmap").as("mime"),
          length(col("media")).cast("long").as("n_bytes")).as("meta"))
  }

  /** The batched decode kernel: parses each PPM header (real binary
    * decode — no access to the source text) and computes payload
    * stats. Malformed input → sentinel (-1) dims, whole-blob stats. */
  private[graft] def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      parsePpmHeader(bytes) match {
        case Some((w, h, off)) =>
          MediaFeatures(id, (bytes.length - off).toLong, unsignedSum(bytes, off), w, h)
        case None =>
          MediaFeatures(id, bytes.length.toLong, unsignedSum(bytes, 0), -1L, -1L)
      }
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

  /** Typed frame-sample output — the declared schema of the sampler. */
  case class FrameSampleRow(doc_id: Long, n_frames: Long, n_sampled: Long,
      sampled_byte_sum: Long)

  /** The stride-sampling kernel over one decoded payload: whole
    * `frameBytes` frames only (a trailing partial frame is dropped,
    * like a truncated final GOP); keeps frames 0, stride, 2·stride, …
    * and sums their bytes. Malformed header → the whole blob is the
    * payload (offset 0), same degradation rule as [[decodeBatch]]. */
  private[graft] def sampleFrames(bytes: Array[Byte], frameBytes: Int,
      stride: Int): Option[(Long, Long, Long)] = {
    val off = parsePpmHeader(bytes).map(_._3).getOrElse(0)
    val n = (bytes.length - off) / frameBytes
    if (n <= 0) None
    else {
      var sum = 0L; var kept = 0L; var f = 0
      while (f < n) {
        if (f % stride == 0) {
          kept += 1
          var i = off + f * frameBytes
          val end = i + frameBytes
          while (i < end) { sum += bytes(i) & 0xff; i += 1 }
        }
        f += 1
      }
      Some((n.toLong, kept, sum))
    }
  }

  /** q85 — frame sampling over the media column: treat the decoded
    * payload as fixed-width frames (a video frame buffer in
    * miniature), keep every `stride`-th frame, checksum the kept
    * bytes — the deterministic skeleton of video frame-sampling
    * (decode → stride-sample → per-frame feature), at the same
    * `mapPartitions` kernel boundary as q31 (per-payload work here, so
    * no batch wrapper — q31's decodeBatch is the genuinely batched
    * twin). Documents whose payload holds no whole frame drop out (and
    * the oracle applies the same rule). The kernel parses the BINARY
    * header and never sees the source text; the DuckDB oracle mirrors
    * the arithmetic from the text side, so the round trip is verified
    * end to end — under the corpus's ASCII-text contract (the oracle
    * counts codepoints and the encoder US_ASCII bytes; a non-ASCII
    * document would diverge, same pre-existing assumption as q31). */
  def frameSample(spark: SparkSession, docs: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] =
      mediaTable(docs).select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media
      .mapPartitions(_.flatMap { case (id, bytes) =>
        sampleFrames(bytes, frameBytes, stride).map { case (n, kept, sum) =>
          FrameSampleRow(id, n, kept, sum)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }
}
