package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** The MinHash-LSH sketch as a PERSISTED, BUCKETED artifact — the
  * production stored side of the q90 incremental probe.
  *
  * Two catalog tables are written: `<name>_bands` (doc_id, ks, band,
  * key), bucketed on the candidate-join key `(band, key)`, and
  * `<name>_sets` (doc_id, ws, n), bucketed on `doc_id` for the verify
  * join-back. Bucketing is the point: a daily ingest probes the stored
  * index with a batch that is a tiny fraction of the corpus, and
  * without it EVERY probe re-shuffles the whole stored relation on the
  * join key — at 100 TB that is the difference between "cost ∝ batch"
  * and "cost ∝ corpus". With the bucket layout matching the join keys,
  * the stored side enters both joins with no Exchange (its
  * HashPartitioning already satisfies the join's required
  * distribution); only the new batch shuffles. SketchStoreSpec pins
  * both the exchange-free plan and stored ≡ in-query results. */
object SketchStore {

  /** Sketch the corpus ONCE and persist both relations, bucketed on
    * their probe keys. The fused (signature + verify-set) aggregation
    * is persisted around the two table writes — each `saveAsTable` is
    * its own action, and without the persist the second write re-runs
    * the whole corpus tokenize+MinHash tower (the dominant save cost
    * at scale, paid twice). */
  def save(docs: DataFrame, name: String, nBuckets: Int = 8): Unit = {
    val (bands, sets, handle) = Dedup.sketchRelationsPersisted(docs)
    try {
      bands.write.mode("overwrite")
        .bucketBy(nBuckets, "band", "key").sortBy("band", "key")
        .saveAsTable(s"${name}_bands")
      sets.write.mode("overwrite")
        .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(s"${name}_sets")
    } finally handle.unpersist()
  }

  def load(spark: SparkSession, name: String): (DataFrame, DataFrame) =
    (spark.table(s"${name}_bands"), spark.table(s"${name}_sets"))

  /** APPEND a new batch's sketches to the stored index with the SAME
    * bucket spec — the write that closes the daily-ingest loop
    * (`LabelStore.commit`): after it, tomorrow's probe sees today's
    * corpus, still exchange-free on the stored side. Spark validates
    * the bucket spec against the existing table, so a drifted layout
    * fails loudly instead of silently degrading every later probe. */
  def append(docs: DataFrame, name: String, nBuckets: Int = 8): Unit = {
    val (bands, sets, handle) = Dedup.sketchRelationsPersisted(docs)
    try {
      bands.write.mode("append")
        .bucketBy(nBuckets, "band", "key").sortBy("band", "key")
        .saveAsTable(s"${name}_bands")
      sets.write.mode("append")
        .bucketBy(nBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(s"${name}_sets")
    } finally handle.unpersist()
  }

  /** Probe the stored index with a new batch (only the batch is
    * sketched; the corpus is read from the bucketed tables). */
  def probe(spark: SparkSession, name: String, newDocs: DataFrame,
      threshold: Double): DataFrame = {
    val (bands, sets) = load(spark, name)
    Dedup.incrementalNearDupStored(bands, sets, newDocs, threshold)
  }
}
