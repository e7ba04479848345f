package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns}

/** Fixed-size sketch operators — aggregations whose state is CONSTANT
  * in corpus size (a d×w integer grid), the structure that lets a
  * 100 TB frequency profile travel as a few KB. Unlike the engine's
  * HLL surface (q39, rows-only — engines' HLL layouts differ), the
  * count-min sketch here is built from the shared deterministic hash
  * family (graft.functions.Hashing), so the DuckDB oracle reproduces
  * the sketch — and its estimates — bit-for-bit. */
object Sketches {

  /** Sketch geometry: depth 4 (one row per hash), width 256. ε ≈
    * 2e/w of the total count, δ ≈ e^−d — coarse on purpose so the
    * testdata actually exercises collisions (est > df on some words;
    * the spec pins one). */
  val CmsDepth = 4
  val CmsWidth = 256

  /** q118 — count-min-sketch heavy hitters: estimated occurrence
    * counts for the true top-`k` words, alongside the exact counts.
    * The sketch invariant est ≥ df holds per construction (hash
    * collisions only ever ADD mass); the estimate is min over the
    * `CmsDepth` rows.
    *
    * Scale shape: one token aggregation with map-side combine builds
    * the per-word counts; the sketch is a `CmsDepth`·`CmsWidth`-cell
    * aggregation of those — CONSTANT-size state regardless of corpus
    * (this is the operator you'd keep as a streaming accumulator); the
    * probe joins the top-k words against the sketch on the (row,
    * bucket) cell key — k·d probe rows against d·w cells, both
    * broadcast-size. Hash family: bucket_j(word) = ((a_j·h + b_j) mod
    * P) mod w over the shared polyHash, a_j/b_j from Hashing.perm*. */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 30): DataFrame = {
    val h = TextFns.polyHash(col("word"))
    val cellArr = explode(array((0 until CmsDepth).map { j =>
      struct(lit(j).as("j"),
        (((h * Hashing.permA(j) + Hashing.permB(j)) % Hashing.P)
          % CmsWidth).as("bucket"))
    }: _*)).as("cell")
    def withCells(words: DataFrame): DataFrame = words
      .select(col("word"), col("df"), cellArr)
      .select(col("word"), col("df"), col("cell.j").as("j"),
        col("cell.bucket").as("bucket"))
    val counts = TextFns.tokens(docs).groupBy("word")
      .agg(count(lit(1)).as("df"))
    // every word contributes its full count to exactly one bucket per
    // sketch row, so summing df per (j, bucket) IS the sketch
    val cells = withCells(counts).groupBy("j", "bucket")
      .agg(sum(col("df")).as("cellsum"))
    // global top-k plans as TakeOrdered (per-partition heaps + one
    // k-row merge), never a single-partition window
    val topk = withCells(counts.orderBy(col("df").desc, col("word").asc)
      .limit(k))
    topk.join(broadcast(cells), Seq("j", "bucket"))
      .groupBy("word", "df")
      .agg(min(col("cellsum")).as("est"))
      .orderBy(col("df").desc, col("word").asc)
  }
}
