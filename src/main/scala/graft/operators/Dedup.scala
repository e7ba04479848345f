package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators over the `documents` corpus — the first of
  * the LLM-training-data-pipeline extensions (SURVEY §2.B last row).
  *
  * Scale ladder: exact hash dedup (linear, one shuffle) → MinHash/LSH
  * (linear in docs, candidates only) → exact Jaccard (quadratic —
  * bounded-candidate baseline used to validate the approximate paths).
  */
object Dedup {

  /** Distinct token set per document, with set size. */
  private[operators] def tokenSets(docs: DataFrame): DataFrame =
    TextFns.docWords(docs)
      .groupBy("doc_id")
      .agg(collect_set(col("word")).as("ws"), count(lit(1)).as("n"))

  /** q18 — exact n-gram(1) Jaccard near-dup pairs, the brute-force
    * baseline. Bounded to doc_id < `cap` on both sides: exact all-pairs
    * Jaccard is O(n²) by definition, so the exact form is only ever run
    * on a bounded candidate set — the linear-scale path is MinHash/LSH
    * (`minhashPairs`), which this validates.
    *
    * jaccard = |A∩B| / (|A|+|B|−|A∩B|), computed from integer set
    * sizes, so the value is bit-identical across engines (no float
    * accumulation). */
  def nearDupJaccard(docs: DataFrame, cap: Long, threshold: Double): DataFrame = {
    val sets = tokenSets(docs).where(col("doc_id") < cap)
    val a = sets.select(col("doc_id").as("doc_a"), col("ws").as("ws_a"), col("n").as("n_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("ws").as("ws_b"), col("n").as("n_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("ws_a"), col("ws_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      // jaccard is a ratio of integers — bit-identical across engines,
      // so it ships unrounded (rounding would only add boundary risk).
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
}
