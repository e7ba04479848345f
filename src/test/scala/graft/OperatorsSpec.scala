package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Operator-level invariants on the sf0.001 testdata (the DuckDB oracle
  * at sf0.01 is the authoritative value check; these pin structural
  * invariants and run fast in CI). */
class OperatorsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def t(n: String) = Tables(spark, dir, n)

  test("q10 semi + anti partition the customer table") {
    val rows = Relational.joinSemiAnti(t("customer"), t("orders"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("with_orders") + rows("without_orders") === t("customer").count())
  }

  test("q12 rollup grand total equals table count") {
    val grand = Relational.rollupAgg(t("orders"))
      .where(col("status") === "ALL").collect()
    assert(grand.length === 1)
    assert(grand(0).getLong(2) === t("orders").count())
  }

  test("q13 returns exactly k rows in descending price order") {
    val rows = Relational.sortLimit(t("orders"), 10).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q19 cosine: self-similarity excluded, k neighbors per query, cos in [-1,1]") {
    val rows = Similarity.cosineTopK(t("embeddings"), 5, 3).collect()
    assert(rows.length === 15)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("q18 jaccard bounds and symmetry-free pairs") {
    val rows = Dedup.nearDupJaccard(t("documents"), 1000L, 0.5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
  }

  test("q20 document counts per lang sum to corpus size") {
    val n = TextAnalysis.textStats(t("documents"))
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(n === t("documents").count())
  }
}
