package graft

import graft.operators.InvertedIndex
import graft.sources.Tables

/** Custom-function surfaces: the codegen'd expression via Column API
  * and SQL registration, and the typed-Aggregator parity with the
  * expression pipeline. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("intersect_count_sorted: Column API and SQL registration agree") {
    import graft.functions.IntersectCountSorted
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1, 2, 3, 7), Array(2, 3, 4, 7))).toDF("a", "b")
    val viaColumn = df.select(IntersectCountSorted(col("a"), col("b"))).collect()(0).getLong(0)
    assert(viaColumn === 3L)
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT intersect_count_sorted(array(1, 2, 3, 7), array(2, 3, 4, 7))")
      .collect()(0).getLong(0)
    assert(viaSql === 3L)
    // disjoint and empty edges
    val edges = df.select(
      IntersectCountSorted(typedLit(Array(1, 2)), typedLit(Array(3, 4))),
      IntersectCountSorted(typedLit(Array.empty[Int]), typedLit(Array(1)))).collect()(0)
    assert(edges.getLong(0) === 0L)
    assert(edges.getLong(1) === 0L)
  }

  test("typed PostingsAggregator matches the expression pipeline (q02 ≡ q37)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val expr = InvertedIndex.postings(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList))
    val typed = InvertedIndex.postingsTyped(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList))
    assert(typed === expr)
  }
}
