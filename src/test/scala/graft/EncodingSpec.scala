package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.sources.Tables

/** The set-encoding inside Dedup maps values to `xxhash64` ids — a
  * stateless projection (no dictionary, nothing joined or broadcast).
  * Jaccard correctness requires the mapping to be injective on the
  * corpus vocabulary; 64-bit space makes collisions ~n²/2⁶⁴, and this
  * spec pins it empirically plus the end-result invariance.
  */
class EncodingSpec extends SparkSpec {

  test("xxhash64 is injective on the corpus vocabularies (words + 3-grams)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val docs = Tables(spark, dir, "documents")
      val words = TextFns.docWords(docs).select("word").distinct()
      val wordCounts = words.agg(
        count(lit(1)).as("n"),
        countDistinct(xxhash64(col("word"))).as("nh")).collect()(0)
      assert(wordCounts.getLong(0) === wordCounts.getLong(1),
        s"word-hash collision at $dir")
      val grams = docs.where(length(col("text")) >= 3)
        .select(explode(sequence(lit(1), length(col("text")) - 2)).as("p"), col("text"))
        .select(expr("substring(text, p, 3)").as("gram")).distinct()
      val gramCounts = grams.agg(
        count(lit(1)).as("n"),
        countDistinct(xxhash64(col("gram"))).as("nh")).collect()(0)
      assert(gramCounts.getLong(0) === gramCounts.getLong(1),
        s"gram-hash collision at $dir")
      // q191's 13-gram encoding rides the same assumption: its oracle
      // counts STRING grams while the engine shuffles xxhash64 longs —
      // this is the injectivity that makes the two countings equal
      val g13 = docs.where(length(col("text")) >= 13)
        .select(explode(sequence(lit(1), length(col("text")) - 12)).as("p"),
          col("text"))
        .select(expr("substring(text, p, 13)").as("gram")).distinct()
      val g13Counts = g13.agg(
        count(lit(1)).as("n"),
        countDistinct(xxhash64(col("gram"))).as("nh")).collect()(0)
      assert(g13Counts.getLong(0) === g13Counts.getLong(1),
        s"13-gram-hash collision at $dir (q191's encoding assumption)")
    }
  }

  test("q18/q22/q24 results are non-empty and pair-consistent under hash encoding") {
    val dir = "/root/testdata/sf0.001"
    Seq("q18_near_dup_jaccard", "q22_minhash_lsh", "q24_ngram_jaccard").foreach { q =>
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows.nonEmpty, s"$q returned no rows")
      assert(rows.forall(r => r.getLong(0) < r.getLong(1)), s"$q pair order broken")
      assert(rows.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0),
        s"$q jaccard out of range")
    }
  }
}
