package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Sampling}

/** Property tests for the iterative connected-components operator and
  * the packing arithmetic — the two places where a subtle off-by-one
  * survives example-based tests. clusterLabels is pinned against a
  * brute-force union-find model on RANDOM graphs (including chains and
  * cycles the near-dup testdata never produces — the pointer-jumping
  * round structure must converge on any topology, not just
  * star/clique near-dup components). */
class ClusterPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Brute-force union-find: min node id per component. */
  private def model(nodes: List[Long], edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  test("clusterLabels equals brute-force union-find on random graphs") {
    val genGraph = for {
      n <- Gen.choose(1, 24)
      nodes = (0L until n.toLong).toList
      nEdges <- Gen.choose(0, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (nodes, edges)
    // a worst-case CHAIN (diameter n−1) plus a cycle, deterministically
    // included: the topologies pointer jumping must not shortcut wrongly
    val chain = ((0L until 12L).toList,
      (0L until 11L).map(i => (i, i + 1)).toList)
    val cycle = ((0L until 9L).toList,
      ((0L until 8L).map(i => (i, i + 1)) :+ (0L, 8L)).toList)
    def run(nodes: List[Long], edges: List[(Long, Long)]): Boolean = {
      val nodesDf = nodes.toDF("doc_id")
      val edgesDf = edges.toDF("doc_a", "doc_b")
      val got = Dedup.clusterLabels(nodesDf, edgesDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == model(nodes, edges)
    }
    assert(run(chain._1, chain._2), "chain graph")
    assert(run(cycle._1, cycle._2), "cycle graph")
    checkProp(Prop.forAll(genGraph) { case (nodes, edges) =>
      run(nodes, edges) }, 12)
  }

  test("q93 semantic clusters equal union-find over its own within-cell edges") {
    val emb = graft.sources.Tables(spark, testdataDir, "embeddings")
    val threshold = 0.2
    val rows = graft.operators.Similarity.semanticDedup(emb, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    // independent edge derivation: GLOBAL cosine pairs at the same
    // threshold (embedNearDup, the exact baseline), restricted to
    // q93's own cell assignment — then the model union-find
    val globalPairs = graft.operators.Similarity
      .embedNearDup(emb, Long.MaxValue, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = globalPairs
      .filter { case (a, b) => cellOf(a) == cellOf(b) }
      .toList
    val expect = model(rows.map(_._1).toList, edges)
    assert(rows.map(r => r._1 -> r._3).toMap === expect)
    assert(edges.nonEmpty, "no within-cell edge — vacuous")
    // and the SemDeDup recall trade is visible: some global pair
    // crosses cells (otherwise the cell bound tested nothing)
    assert(globalPairs.length > edges.length,
      "every near-dup pair landed in one cell")
  }

  test("mergeClusterLabels: incremental merge == rebuild on random graph splits") {
    // the merge ≡ rebuild law for CC labels: split every random graph
    // at a cap into OLD (stored labels from the old subgraph) and NEW
    // (delta edges = any edge with a new endpoint); the incremental
    // merge must equal a from-scratch run over the full graph —
    // including chains of new docs bridging several old components
    val genGraph = for {
      n <- Gen.choose(2, 24)
      cap <- Gen.choose(1, n - 1)
      nodes = (0L until n.toLong).toList
      nEdges <- Gen.choose(0, 30)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield (nodes, edges, cap.toLong)
    def run(nodes: List[Long], edges: List[(Long, Long)], cap: Long): Boolean = {
      val oldNodes = nodes.filter(_ < cap)
      val newNodes = nodes.filter(_ >= cap)
      val oldEdges = edges.filter { case (a, b) => a < cap && b < cap }
      val deltaEdges = edges.filter { case (a, b) => a >= cap || b >= cap }
      val stored = Dedup.clusterLabels(
          oldNodes.toDF("doc_id"), oldEdges.toDF("doc_a", "doc_b"))
        .select("doc_id", "cluster_id")
      val got = Dedup.mergeClusterLabels(stored,
          newNodes.toDF("doc_id"), deltaEdges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == model(nodes, edges)
    }
    // deterministic worst case: a chain of NEW docs (4,5,6) bridging
    // two OLD components {0,1} and {2,3} — labels must merge across
    // the whole bridge, and new node 7 stays isolated (self-label)
    assert(run((0L to 7L).toList,
      List((0L, 1L), (2L, 3L), (1L, 4L), (4L, 5L), (5L, 6L), (6L, 3L)), 4L),
      "new-doc bridge between two old components")
    checkProp(Prop.forAll(genGraph) { case (nodes, edges, cap) =>
      run(nodes, edges, cap) }, 12)
  }

  test("only delta-adjacent components enter the incremental sub-problem") {
    // stored: component {1,2} labeled 1 (untouched), singletons 3 and
    // 4; batch {10,11}; delta edges attach 10 to 3 and 4. The
    // contracted edge set must EXCLUDE component 1 entirely (its label
    // never enters the loop), and the final labels keep 1/2 verbatim
    // while 3,4,10 merge under label 3 and 11 self-labels.
    val stored = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val newNodes = Seq(10L, 11L).toDF("doc_id")
    val delta = Seq((10L, 3L), (10L, 4L)).toDF("doc_a", "doc_b")
    val contracted = Dedup.contractEdges(stored, delta).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(contracted === Set(10L, 3L, 4L),
      "untouched component 1 must not appear in the contracted graph")
    val got = Dedup.mergeClusterLabels(stored, newNodes, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got === List((1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 3L, false), (10L, 3L, false), (11L, 11L, true)))
  }

  test("within-old-component delta edges contract to dropped self-loops") {
    // a new batch can re-discover an OLD near-dup pair (both endpoints
    // already share a label): the contraction must collapse it to a
    // self-loop and drop it, never re-enter the component into the loop
    val stored = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val delta = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    assert(Dedup.contractEdges(stored, delta).count() === 0L)
    val got = Dedup.mergeClusterLabels(stored,
        Seq.empty[Long].toDF("doc_id"), delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("q202 incremental clusters equal the from-scratch rebuild on the corpus") {
    val docs = graft.sources.Tables(spark, testdataDir, "documents")
    val inc = Dedup.incrementalClusters(docs, 250L, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    val full = Dedup.dedupClustersScale(docs, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(inc === full)
    // non-vacuity: at least one cross-boundary merge actually happened
    // (a new doc labeled by an old canonical)
    assert(inc.exists { case (id, cl, _) => id >= 250L && cl < 250L },
      "no new doc joined an old cluster — the merge path was not exercised")
  }

  test("packSequences: every doc starts inside its pack's budget window") {
    val docs = Sampling.packSequences(
      graft.sources.Tables(spark, testdataDir, "documents"),
      budget = 512, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    docs.groupBy(_._2).values.foreach { shard =>
      var cum = 0L
      shard.sortBy(_._1).foreach { case (_, _, nTok, packId) =>
        assert(packId === cum / 512, "pack id is the budget window the doc STARTS in")
        cum += nTok
      }
    }
  }
}
