package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex

/** The inverted index as a PERSISTED artifact: a letter-partitioned
  * parquet table of `(word, df, postings)` — the durable analogue of
  * the reference's 26 text files (R16, `main.c++:231-266`), but
  * columnar, splittable, and predicate-prunable.
  *
  * Point lookups read 1/26th of the data via partition pruning (the
  * `letter=` directory) plus a pushed word filter inside it; at 100 TB
  * the index is built once and every doc-set query afterwards touches
  * only the partitions it names. */
object IndexStore {

  /** Build and persist the index, partitioned by first letter. */
  def save(docs: DataFrame, path: String): Unit =
    InvertedIndex.postingsUnordered(docs)
      .withColumn("letter", substring(col("word"), 1, 1))
      .write.mode("overwrite")
      .partitionBy("letter")
      .parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Posting list for one word — partition-pruned to its letter
    * directory, word filter pushed into the parquet scan. */
  def lookup(index: DataFrame, word: String): DataFrame =
    index
      .where(col("letter") === word.substring(0, 1) && col("word") === word)
      .select("word", "df", "postings")

  /** Documents containing the word, one row per doc id. */
  def docsWith(index: DataFrame, word: String): DataFrame =
    lookup(index, word)
      .select(explode(col("postings")).as("doc_id"))
      .orderBy("doc_id")
}
