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
