package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level text analysis over `documents` — LLM-pipeline extension
  * (SURVEY §2.B last row). */
object TextAnalysis {

  /** q20 — per-language corpus stats: document count, vocabulary size,
    * mean tokens per document. One tokenize pass, one shuffle. */
  def textStats(docs: DataFrame): DataFrame =
    TextFns.tokens(docs, Seq("lang"))
      .groupBy("lang")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("word")).as("n_words"),
        round(count(lit(1)).cast("double") / countDistinct(col("doc_id")), 2)
          .as("avg_tokens"))
      .orderBy("lang")
}
