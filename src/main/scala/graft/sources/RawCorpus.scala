package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's exact input contract (R1–R3): a manifest text file
  * whose first line is the file count and whose next N lines are file
  * paths (`/root/reference/main.c++:306-352`); document ids are the
  * 1-based manifest positions (`main.c++:74-77`).
  *
  * Returns `(doc_id, text)` with one row per LINE of each document —
  * exactly what the reference's per-line map loop consumes
  * (`main.c++:85-98`); the index pipeline's per-doc distinct makes the
  * line/document split immaterial for postings. CR/LF is stripped the
  * canonical way (reference quirk Q3 resolved, SURVEY §2.A).
  *
  * The manifest is read driver-side (it is small by contract — a list
  * of paths); each file becomes one `spark.read.text` scan and the
  * scans union. For corpora beyond manifest scale, skip the manifest:
  * `spark.read.text(dir)` + `input_file_name()` gives the same shape
  * with one distributed scan.
  */
object RawCorpus {

  def fromManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    // readAllLines already consumes \n, \r\n AND bare \r terminators —
    // the Q3 CR/LF quirk is resolved by the line reader itself.
    val lines = Files.readAllLines(Paths.get(manifestPath), StandardCharsets.UTF_8)
      .asScala.toList
    // Unparseable or missing count line denotes an empty corpus (the
    // reference would hit UB here, quirk Q3 — not replicated).
    val n = lines.headOption.flatMap(_.trim.toIntOption).getOrElse(0)
    // doc_id = 1-based MANIFEST POSITION (main.c++:74-77): index before
    // dropping blanks, so a blank line cannot shift later ids.
    val perFile = lines.drop(1).take(n).zipWithIndex
      .map { case (p, i) => (p.trim, i + 1) }
      .filter(_._1.nonEmpty)
      .map { case (p, id) =>
        spark.read.text(p).select(
          lit(id.toLong).as("doc_id"),
          col("value").as("text"))
      }
    if (perFile.isEmpty) emptyCorpus(spark) else perFile.reduce(_ unionByName _)
  }

  /** Zero-row corpus with the canonical (doc_id, text) schema — what an
    * empty manifest denotes (the reference would idle its mappers;
    * every operator here yields a well-typed empty result instead). */
  def emptyCorpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  /** The SCALE path for raw text corpora: one distributed scan of a
    * directory of `<id>.txt` files, doc ids parsed from the file names
    * — no driver-side manifest, no N-way union; at 100 TB this is a
    * single splittable FileScan. (fromManifest exists for exact parity
    * with the reference's small-N manifest contract.) */
  def fromDirectory(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(s"$dir/*.txt")
      // only numeric-named corpus files — sidecar files (manifest,
      // READMEs) in the same directory are not documents
      .where(input_file_name().rlike("/\\d+\\.txt$"))
      .select(
        regexp_extract(input_file_name(), "(\\d+)\\.txt$", 1)
          .cast("long").as("doc_id"),
        col("value").as("text"))
}
