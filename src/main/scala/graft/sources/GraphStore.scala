package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The ANN GRAPH as a PERSISTED, MAINTAINED artifact — the production
  * loop around `Similarity.nswGraphIncremental` (q206's operator),
  * completing the store family: SketchStore/LabelStore maintain the
  * dedup DECISION, VectorStore serves the cell-pruned probe, and this
  * maintains the navigable-graph INDEX a daily embedding ingest needs.
  *
  * TWO relations per store, plus a watermark:
  *
  *  - `<name>_base` — the top-m scored base (the NSW insertion state,
  *    what HNSW retains between inserts). This is what the merge law
  *    operates on: top-m(A ∪ B) = top-m(top-m(A) ∪ B), so keeping the
  *    m-bounded base loses NOTHING vs keeping every raw candidate.
  *  - `<name>` — the polished search graph (NN-descent + symmetrize +
  *    2m prune over the base), the relation `nswSearchOver` probes.
  *  - `<name>_meta` — one row: the id WATERMARK (exclusive upper
  *    bound of ingested vec_ids). Stored explicitly rather than
  *    derived as max(src)+1 because an isolated node (no bucket
  *    collision, vec_id 0 has no long links) can be absent from the
  *    edge relation without being absent from the corpus.
  *
  * Both edge relations are BUCKETED on `src` — the key of every join
  * that consumes them: the beam search's per-round frontier ⋈ edges
  * join and the merge's top-m window both want hash(src), so the
  * stored graph enters exchange-free (the SketchStore/LabelStore
  * rationale: probe/update cost ∝ frontier/batch, never a reshuffle
  * of the stored corpus-sized artifact).
  *
  * Crash-safety ORDER ([[commit]]): base first, graph second, META
  * LAST. The watermark is the commit point — a crash before it leaves
  * the old cap in place, and the RECOVERY RULE is simply re-run the
  * day's ingest: [[update]] is idempotent because the merge pair-key
  * dedups (`nswMergeBase`), so delta edges already folded into a
  * half-written base cannot occupy two window ranks, and a fully
  * committed day's re-run sees an empty delta (no candidate pair has
  * an endpoint ≥ the new watermark). */
object GraphStore {

  private def writeEdges(edges: DataFrame, table: String,
      nBuckets: Int): Unit =
    edges.select("src", "dst", "cos6").write.mode("overwrite")
      .bucketBy(nBuckets, "src").sortBy("src")
      .saveAsTable(table)

  /** Bootstrap the store from an initial corpus: full build, both
    * relations persisted, watermark = cap (exclusive). */
  def build(spark: SparkSession, name: String, embeddings: DataFrame,
      cap: Long, m: Int = 8, nBuckets: Int = 8): Unit = {
    val base = Similarity.nswBase(embeddings, m).localCheckpoint(true)
    val graph = Similarity.nswPolish(embeddings, base, m)
    commitFrozen(spark, name, base, graph, cap, nBuckets)
  }

  /** (base, polished graph, watermark). */
  def load(spark: SparkSession, name: String): (DataFrame, DataFrame, Long) =
    (spark.table(name + "_base"), spark.table(name),
      spark.table(name + "_meta").head().getLong(0))

  /** Merge the stored base with the DELTA candidates of everything
    * between the stored watermark and `newCap`, and re-polish. Pure
    * read — call [[commit]] to persist. `embeddings` is the CURRENT
    * corpus (old ∪ new rows); only pairs with a new endpoint are
    * scored, so the expensive stage prices the delta (old nodes'
    * long links are growth-stable by the mod-src rule and old×old
    * bucket pairs are already folded into the stored base). */
  def update(spark: SparkSession, name: String, embeddings: DataFrame,
      newCap: Long, m: Int = 8): (DataFrame, DataFrame) = {
    val (storedBase, _, oldCap) = load(spark, name)
    val visible = embeddings.where(col("vec_id") < newCap)
    val base = Similarity.nswMergeBase(visible, storedBase, oldCap, m)
    (base, Similarity.nswPolish(visible, base, m))
  }

  /** Persist an updated (base, graph) pair and advance the watermark
    * to `newCap`. Both inputs read FROM the tables being replaced, so
    * they are frozen (localCheckpoint) before any write starts. */
  def commit(spark: SparkSession, name: String, base: DataFrame,
      graph: DataFrame, newCap: Long, nBuckets: Int = 8): Unit =
    commitFrozen(spark, name,
      base.select("src", "dst", "cos6").localCheckpoint(true),
      graph.select("src", "dst", "cos6").localCheckpoint(true),
      newCap, nBuckets)

  /** The three-table publish runs under the store's exclusive commit
    * lease ([[StoreLock.withStoreLease]], fail-clean): two
    * simultaneous committers would otherwise interleave base / graph /
    * watermark writes across jobs — a graph from batch A over a base
    * from batch B, under whichever watermark landed last. The loser
    * throws before any write starts (its update was a pure read), so
    * its artifact never becomes visible; both inputs are frozen
    * BEFORE the lease so no materialize cost is spent under it. */
  private def commitFrozen(spark: SparkSession, name: String,
      base: DataFrame, graph: DataFrame, cap: Long, nBuckets: Int): Unit =
    StoreLock.withStoreLease(spark, name) {
      writeEdges(base, name + "_base", nBuckets)
      writeEdges(graph, name, nBuckets)
      // watermark LAST — the commit point (see scaladoc ordering note)
      import spark.implicits._
      Seq(cap).toDF("cap").write.mode("overwrite").saveAsTable(name + "_meta")
    }
}
