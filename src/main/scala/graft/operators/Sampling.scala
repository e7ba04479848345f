package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic corpus sampling / split assignment — LLM-pipeline
  * extension (SURVEY §2.B last row).
  *
  * Train/val/test splits over a 100 TB corpus must be (a) stable across
  * reruns and engines, (b) computable per-row with no shuffle, and
  * (c) stratifiable. Spark's `sample()`/`TABLESAMPLE` are seeded per
  * partition — results change with partitioning — so the production
  * pattern is a content-keyed hash bucket: every row maps to a bucket
  * by a deterministic hash of its key, and split boundaries are bucket
  * ranges. The cross-engine `polyHash` (TextFns) makes the assignment
  * reproducible in DuckDB for the oracle, exactly as it would be
  * reproducible for a downstream consumer in another stack.
  */
object Sampling {

  /** q45 — hash-bucket split assignment: bucket = polyHash(doc_id) mod
    * `buckets`, split = "train" below `trainBuckets`, else "val". A
    * pure per-row projection — no shuffle, no state, order-independent:
    * the same doc lands in the same split at any scale, partitioning,
    * or engine. */
  def hashSplit(docs: DataFrame, buckets: Int = 100, trainBuckets: Int = 90): DataFrame =
    docs
      .select(col("doc_id"),
        pmod(TextFns.polyHash(col("doc_id").cast("string")), lit(buckets.toLong))
          .as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainBuckets, lit("train")).otherwise(lit("val")))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Split-level summary (the sanity check a pipeline runs after
    * assignment): docs and mean bucket per split. */
  def splitStats(docs: DataFrame, buckets: Int = 100, trainBuckets: Int = 90): DataFrame =
    hashSplit(docs, buckets, trainBuckets)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** q61 — stratified sampling audit: the same deterministic hash
    * bucketing as q45, applied at an equal rate (1/`buckets`) WITHIN
    * each stratum (here `lang`), reported per stratum. Because the
    * bucket is keyed on content (doc_id), not position, every stratum
    * is sampled at the same expected rate with zero coordination — no
    * per-stratum counts, no second pass, no shuffle beyond the final
    * summary aggregation. This is how a 100 TB pipeline draws an
    * audit/eval slice per language. */
  def stratifiedSample(docs: DataFrame, buckets: Int = 10): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        (pmod(TextFns.polyHash(col("doc_id").cast("string")), lit(buckets.toLong)) === 0)
          .cast("long").as("sampled"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("sampled")).as("n_sampled"))
      .withColumn("rate", col("n_sampled").cast("double") / col("n_docs"))
      .orderBy("lang")
}
