package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** q150/q151 (TPC-H Q9/Q12 shapes): the hinted engine formulations are
  * value-identical to hint-free SQL, and the conditional aggregation
  * partitions the joined rows exactly. */
class TpchShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def canon(df: DataFrame) = df.collect().map(_.toString).toList

  test("q150: broadcast-hinted Q9 == the no-hints SQL formulation") {
    val part = Tables(spark, dir, "part")
    val supplier = Tables(spark, dir, "supplier")
    val lineitem = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val nation = Tables(spark, dir, "nation")
    val hinted = Relational.tpchQ9(part, supplier, lineitem, orders, nation)
    part.createOrReplaceTempView("q9_part")
    supplier.createOrReplaceTempView("q9_supplier")
    lineitem.createOrReplaceTempView("q9_lineitem")
    orders.createOrReplaceTempView("q9_orders")
    nation.createOrReplaceTempView("q9_nation")
    val plain = spark.sql(
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |          - CAST(p_retailprice * l_quantity / 10 AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM q9_lineitem
        |JOIN q9_part ON p_partkey = l_partkey
        |JOIN q9_supplier ON s_suppkey = l_suppkey
        |JOIN q9_nation ON n_nationkey = s_nationkey
        |JOIN q9_orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)
    assert(canon(hinted) === canon(plain))
    assert(hinted.count() > 0)
    // the hints actually took: three broadcast joins in the plan
    val planStr = hinted.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin"), s"no broadcast in:\n$planStr")
  }

  test("q151: the two conditional counts partition the joined rows") {
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    val q12 = Relational.tpchQ12(orders, lineitem).collect()
    assert(q12.nonEmpty)
    val total = lineitem
      .where(col("l_returnflag").isin("A", "N") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(q12.map(r => r.getLong(1) + r.getLong(2)).sum === total,
      "high + low counts must cover every joined row exactly once")
  }
}
