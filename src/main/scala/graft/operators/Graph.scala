package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relations the engine already builds — the
  * iterative-numeric sibling of the connected-components decision step
  * (q49/q58's label loop). */
object Graph {

  /** Truncate a bounded intermediate's lineage (eager localCheckpoint)
    * unless the session runs in plan-audit mode — the Dedup family's
    * checkpoint-hygiene convention (`spark.graft.eagerMaterialize`). */
  private def materialized(session: DataFrame, df: DataFrame): DataFrame =
    if (session.sparkSession.conf
      .get("spark.graft.eagerMaterialize", "true").toBoolean)
      df.localCheckpoint(true)
    else df

  /** q132 — degree profile of the near-dup graph: nodes per degree,
    * INCLUDING the zero-degree mass (the left join against the node
    * frame — most docs are near-dup-isolated, and that count is the
    * headline number for a dedup pipeline). Two map-side-combinable
    * aggregations over the edge relation; the histogram is bounded by
    * max degree, not corpus size. Same edge definition as
    * q111/q112 (q18's capped exact pairs). */
  def degreeProfile(docs: DataFrame, cap: Long = 500L,
      threshold: Double = 0.95): DataFrame = {
    val nodes = docs.where(col("doc_id") < cap).select("doc_id")
    val edges = Dedup.nearDupPairsShared(docs, cap, threshold)
      .select("doc_a", "doc_b")
    val deg = edges.select(col("doc_a").as("u"))
      .union(edges.select(col("doc_b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    nodes.join(deg, nodes("doc_id") === deg("u"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("deg"))
      .groupBy("deg")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("deg")
  }

  /** q111 — PageRank over the near-dup graph: rank documents by how
    * centrally they sit in the duplication structure (a high-rank doc
    * is a "template" many near-copies orbit — pipelines inspect these
    * before choosing cluster canonicals). Same edge relation as q49
    * (bounded exact-Jaccard pairs; the q58 LSH chain is the scale
    * feeder), `iters` damped rounds, uniform start.
    *
    * Cross-engine determinism is the whole design: ranks live as
    * INTEGER units (SCALE = 10¹²) and every update is integer
    * arithmetic — contribution = r div deg, damping through the exact
    * rational 85/100 as `(85 · x) div 100`, dangling mass redistributed
    * as `dang div N` — so both engines walk bit-identical rank vectors
    * (a double PageRank would drift with partition order in the very
    * first sum). `iters` is a fixed small constant: the lazy tree stays
    * shallow (the q92 rule), no checkpoint hygiene needed — unlike the
    * unbounded q49 loop.
    *
    * Scale shape per round: one join of the rank vector to the degree
    * relation (both keyed by node), one shuffle aggregation of edge
    * contributions on the destination key with map-side combine, and a
    * ONE-ROW dangling-mass broadcast. Nothing corpus-sized is
    * collected or broadcast; the edge relation is the bounded q18
    * candidate set here and the q22/q58 LSH edges at scale. */
  def pageRank(docs: DataFrame, cap: Long = 1000L, threshold: Double = 0.95,
      iters: Int = 3): DataFrame = {
    val Scale = 1000000000000L
    val nodes = docs.where(col("doc_id") < cap).select("doc_id")
    val nRow = nodes.agg(count(lit(1)).as("nn"))
    // the O(cap²) pair stage is computed ONCE — and shared across the
    // session's whole graph family via the pair memo (the loop reuses
    // sym/deg every round; without a checkpoint leaf the lazy tree
    // would replay the edge join 2^iters-fold)
    val edges = Dedup.nearDupPairsShared(docs, cap, threshold)
      .select("doc_a", "doc_b")
    // both orientations; input pairs are unique (doc_a < doc_b), so
    // this is a disjoint union — no distinct needed
    val sym = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    var pr = nodes.crossJoin(broadcast(nRow))
      .select(col("doc_id").as("u"), expr(s"$Scale div nn").as("r"))
    for (_ <- 0 until iters) {
      val withDeg = pr.join(deg, Seq("u"), "left")
      val dang = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val inflow = withDeg.where(col("deg").isNotNull)
        .withColumn("c", expr("r div deg"))
        .join(sym, Seq("u"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("inflow"))
        .withColumnRenamed("v", "doc_id")
      pr = Graph.materialized(docs,
        nodes.crossJoin(broadcast(nRow)).crossJoin(broadcast(dang))
          .join(inflow, Seq("doc_id"), "left")
          .select(col("doc_id").as("u"),
            (expr(s"(($Scale * 15) div 100) div nn") +
              expr("(85 * (coalesce(inflow, 0) + dang div nn)) div 100")).as("r")))
    }
    pr.select(col("u").as("doc_id"), col("r").as("rank_q"))
      .orderBy(col("rank_q").desc, col("doc_id").asc)
  }

  /** q112 — triangle counting + local clustering coefficient over the
    * same near-dup graph as q111. A triangle is three documents that
    * are pairwise near-duplicates — the densest unit of the duplication
    * structure (dedup pipelines treat high-clustering nodes as template
    * families; low-clustering high-degree nodes as hubs/boilerplate).
    *
    * The scale design is DEGREE ORIENTATION: each undirected edge is
    * directed from its lower-(degree, id) endpoint, which makes the
    * orientation an acyclic total order, so every triangle is counted
    * exactly once as a directed path u→v→w closed by u→w — and bounds
    * every node's out-degree by O(√m), so the wedge self-join is
    * O(m^1.5) worst-case instead of Σdeg² (a single hub node would
    * otherwise square). All three steps are equi-joins on node keys —
    * shuffle-partitioned, map-side combinable, AQE-splittable; nothing
    * driver-side. The per-node rollup explodes each triangle into its
    * three corners and re-aggregates on the node key. */
  def triangles(docs: DataFrame, cap: Long = 1000L,
      threshold: Double = 0.95): DataFrame = {
    // edges (memo-shared checkpoint leaf) and the oriented relation
    // are each REUSED (deg + the 3-way wedge join): without leaves the
    // lazy tree replays the pair stage ~54× across the full DAG
    val edges = Dedup.nearDupPairsShared(docs, cap, threshold)
      .select("doc_a", "doc_b")
    val sym = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val ori = Graph.materialized(docs, sym
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
      .where(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select("u", "v"))
    val tri = ori.as("e1")
      .join(ori.as("e2"), col("e1.v") === col("e2.u"))
      .join(ori.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    // cc = 2·tri / (deg·(deg−1)): one integer-exact division per row,
    // rounded to 6 dp — no float accumulation anywhere
    deg.withColumnRenamed("u", "doc_id")
      .join(perNode.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .withColumn("cc",
        when(col("deg") > 1,
          round(lit(2.0) * col("tri") / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("tri").desc, col("doc_id").asc)
  }

  /** q185 — BFS shortest-hop distances from a deterministic seed (the
    * smallest node carrying an edge) over the same near-dup graph as
    * q111/q112: "how many near-dup steps away is each document from
    * the canonical template" — the reachability question a dedup
    * pipeline asks when it propagates a keep/drop decision through a
    * cluster. Frontier expansion, `maxHops` bounded rounds: each round
    * is ONE join of the frontier to the edge relation (keyed, map-side
    * combinable distinct) and one anti-join against the known set —
    * both frontier-sized, never corpus-sized; intermediates are
    * checkpoint-truncated like the q49/q111 loops. Unreached nodes are
    * absent from the output (the contract states reached-within-k).
    * The oracle replays it as a DuckDB recursive CTE with min-dist
    * aggregation — frontier-BFS distance ≡ min over all ≤k-hop walks. */
  def bfsHops(docs: DataFrame, cap: Long = 1000L, threshold: Double = 0.95,
      maxHops: Int = 4): DataFrame = {
    val edges = Dedup.nearDupPairsShared(docs, cap, threshold)
      .select("doc_a", "doc_b")
    val sym = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
    var known = materialized(docs,
      sym.agg(min(col("u")).as("doc_id")).withColumn("dist", lit(0L)))
    var frontier = known
    for (h <- 1 to maxHops) {
      val next = frontier.join(sym, frontier("doc_id") === sym("u"))
        .select(col("v").as("doc_id")).distinct()
        .join(known, Seq("doc_id"), "left_anti")
        .withColumn("dist", lit(h.toLong))
      frontier = materialized(docs, next)
      known = materialized(docs, known.unionByName(frontier))
    }
    known.orderBy("doc_id")
  }
}
