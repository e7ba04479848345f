package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.TopKAggregator

/** Property tests for the bounded top-k aggregator: Spark may split
  * the input across ANY number of partial buffers and merge them in
  * ANY grouping/order — the aggregator's contract is that every such
  * execution equals the direct sort-take. Example-based tests can't
  * cover the merge lattice; random splits can. */
class TopKPropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def checkProp(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** The intended (Spark SQL) ordering: NaN largest, -0.0 ≡ 0.0,
    * ascending-id ties. The aggregator-vs-SPARK-WINDOW pin lives in
    * PipelineOpsSpec; this model pins the merge lattice against it. */
  private def direct(rows: List[(Double, Long)], k: Int): Seq[(Double, Long)] = {
    def norm(v: Double) = if (v == 0.0) 0.0 else v
    rows.sortWith { (a, b) =>
      val c = java.lang.Double.compare(norm(b._1), norm(a._1))
      if (c != 0) c < 0 else a._2 < b._2
    }.take(k)
  }

  test("any partition into partials + any merge order ≡ direct top-k") {
    val genValue = Gen.frequency(
      (8, Gen.chooseNum(0, 9).map(_.toDouble)), // ties common
      (1, Gen.const(Double.NaN)), // Spark: largest
      (1, Gen.const(-0.0))) // Spark: ≡ 0.0
    val genRows = for {
      n <- Gen.chooseNum(0, 120)
      rows <- Gen.listOfN(n, Gen.zip(genValue, Gen.chooseNum(0L, 500L)))
    } yield rows
    val p = Prop.forAll(genRows, Gen.chooseNum(1, 7), Gen.chooseNum(0L, 1000L)) {
      (rows, k, seed) =>
        val agg = new TopKAggregator(k)
        val rnd = new scala.util.Random(seed)
        // random split into partial buffers
        val chunks = rows.grouped(math.max(1, rnd.nextInt(10) + 1)).toList
        val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        // every partial respects the state bound at every point
        assert(partials.forall(_.length <= k))
        // random-order pairwise merges (the shape Spark's final
        // aggregation actually performs)
        var bufs = rnd.shuffle(partials)
        while (bufs.length > 1) {
          val merged = agg.merge(bufs.head, bufs(1))
          assert(merged.length <= k)
          bufs = rnd.shuffle(merged :: bufs.drop(2))
        }
        val got = agg.finish(bufs.headOption.getOrElse(agg.zero))
        got == direct(rows, k)
    }
    checkProp(p, 200)
  }
}
