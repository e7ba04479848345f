package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** q199 — BPE MERGE TRAINING: the byte-pair-encoding vocabulary
  * induction loop (Sennrich et al.) — the step that BUILDS the
  * tokenizer the rest of the pipeline only applies (q29 estimates
  * tokens; this learns the merges). Classic formulation: train on the
  * VOCABULARY with frequencies, not the corpus — one tokenize
  * aggregation reduces 100 TB of text to a vocabulary-sized (word,
  * freq) relation, and every round after that is vocabulary-sized
  * work. Per round: (1) adjacent symbol pairs weighted by word freq —
  * one aggregation; (2) the argmax pair with (count desc, pair asc)
  * tie-break — a one-row driver read, the same bounded convergence-
  * probe pattern as the q49/q58 CC loops; (3) GREEDY-LEFTMOST merge:
  * overlapping occurrences of the best pair (a run like "aaa" for
  * best (a,a)) merge at odd offsets within each run — the sequential
  * tokenizer rule, expressed relationally as row_number over
  * consecutive-position runs; (4) symbol arrays rebuilt by ordered
  * re-collection, lineage truncated per round (localCheckpoint, the
  * CC discipline). The oracle replays the IDENTICAL algebra as
  * generated chained CTEs — each round's argmax depends on every
  * previous merge, so a hash match gates the whole loop. */
object Bpe {

  /** The learned merge table: one row per round —
    * (step, lhs, rhs, merged, pair_count). */
  def bpeMerges(docs: DataFrame, rounds: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // vocabulary with frequencies; symbols start as single chars.
    // (transform+substring, not split(word, "") — Java's split keeps a
    // trailing empty element under limit -1, DuckDB's does not.)
    var syms = TextFns.tokens(docs)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val pairs = syms
        // guard: sequence(1, 0) DESCENDS in Spark, so a one-symbol
        // word must not reach the explode (same discipline as every
        // gram explode in the suite)
        .where(size(col("syms")) >= 2)
        .select(col("word"), col("freq"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"),
          col("syms"))
        .select(col("word"), col("freq"), col("i"),
          element_at(col("syms"), col("i")).as("a"),
          element_at(col("syms"), col("i") + 1).as("b"))
      val bestRows = pairs.groupBy("a", "b").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (bestRows.isEmpty) {
        // degenerate vocabulary (all 1-char words): nothing to merge
        return merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
          .orderBy("step")
      }
      val (ba, bb, cnt) =
        (bestRows(0).getString(0), bestRows(0).getString(1), bestRows(0).getLong(2))
      merges += ((r, ba, bb, ba + bb, cnt))

      // greedy-leftmost: among consecutive best-pair positions (a run),
      // merge at odd offsets; position mi consumes syms[mi], syms[mi+1]
      val wRun = Window.partitionBy("word").orderBy("i")
      val mergePos = pairs
        .where(col("a") === ba && col("b") === bb)
        .withColumn("rn", row_number().over(wRun))
        .withColumn("run", col("i") - col("rn"))
        .withColumn("k",
          row_number().over(Window.partitionBy("word", "run").orderBy("i")))
        .where(col("k") % 2 === 1)
        .select(col("word"), col("i").as("mi"))

      val allPos = syms.select(col("word"), col("freq"),
        explode(sequence(lit(1), size(col("syms")))).as("p"), col("syms"))
      syms = rebuild(allPos, mergePos).localCheckpoint(true)
    }
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
      .orderBy("step")
  }

  /** Rebuild per-word symbol arrays after a merge round: a merge-start
    * position emits the concatenated pair, the position it consumed is
    * dropped, everything else passes through; arrays re-collected in
    * position order. */
  private def rebuild(allPos: DataFrame, mergePos: DataFrame): DataFrame =
    allPos
      .join(mergePos.select(col("word"), col("mi").as("p"),
          lit(true).as("is_start")), Seq("word", "p"), "left_outer")
      .join(mergePos.select(col("word"), (col("mi") + 1).as("p"),
          lit(true).as("is_second")), Seq("word", "p"), "left_outer")
      .where(col("is_second").isNull)
      .select(col("word"), col("freq"), col("p"),
        when(col("is_start"),
          concat(element_at(col("syms"), col("p")),
            element_at(col("syms"), col("p") + 1)))
          .otherwise(element_at(col("syms"), col("p"))).as("s"))
      .groupBy("word", "freq")
      .agg(expr("transform(sort_array(collect_list(struct(p, s))), x -> x.s)")
        .as("syms"))
}
