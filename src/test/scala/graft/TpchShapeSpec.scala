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

  test("q152: decorrelated min-agg join ≡ Spark SQL correlated subquery") {
    val lineitem = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val supplier = Tables(spark, dir, "supplier")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    val engine = Relational.tpchQ2(lineitem, part, supplier, nation, region)
    lineitem.createOrReplaceTempView("q2_lineitem")
    part.createOrReplaceTempView("q2_part")
    supplier.createOrReplaceTempView("q2_supplier")
    nation.createOrReplaceTempView("q2_nation")
    region.createOrReplaceTempView("q2_region")
    // the textbook correlated scalar subquery, through Spark's OWN
    // parser/decorrelator — proves the hand decorrelation ≡ Catalyst's
    val correlated = spark.sql(
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, p_name,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM q2_lineitem JOIN q2_part ON p_partkey = l_partkey
        |  WHERE p_size <= 10)
        |SELECT DISTINCT
        |       CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c,
        |       s_name, n_name, l.l_partkey AS p_partkey, p_name,
        |       price_c AS min_price_c
        |FROM shipped l
        |JOIN q2_supplier ON s_suppkey = l_suppkey
        |JOIN q2_nation ON n_nationkey = s_nationkey
        |JOIN q2_region ON r_regionkey = n_regionkey
        |WHERE r_name = 'ASIA'
        |  AND price_c = (SELECT min(price_c) FROM shipped l2
        |                 WHERE l2.l_partkey = l.l_partkey)
        |ORDER BY acctbal_c DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
    assert(canon(engine) === canon(correlated))
    assert(engine.count() > 0)
  }

  test("q153: HAVING-vs-global-scalar gate is neither empty nor total") {
    val lineitem = Tables(spark, dir, "lineitem")
    val kept = Relational.tpchQ11(lineitem).count()
    val parts = lineitem.select("l_partkey").distinct().count()
    assert(kept > 0, "gate empty — threshold vacuous")
    assert(kept < parts, "gate keeps every part — threshold vacuous")
  }

  test("q154: semi-join chain ≡ Spark SQL correlated-HAVING-in-IN") {
    val lineitem = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    val supplier = Tables(spark, dir, "supplier")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    val engine = Relational.tpchQ20(lineitem, part, supplier, nation, region)
    lineitem.createOrReplaceTempView("q20_lineitem")
    part.createOrReplaceTempView("q20_part")
    supplier.createOrReplaceTempView("q20_supplier")
    nation.createOrReplaceTempView("q20_nation")
    region.createOrReplaceTempView("q20_region")
    val correlated = spark.sql(
      """WITH windowed AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS q
        |  FROM q20_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM q20_part
        |                      WHERE p_name LIKE 'small%'))
        |SELECT s_suppkey, s_name
        |FROM q20_supplier
        |JOIN q20_nation ON n_nationkey = s_nationkey
        |JOIN q20_region ON r_regionkey = n_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM windowed w
        |    GROUP BY l_partkey, l_suppkey
        |    HAVING 2 * sum(q) > (SELECT sum(q) FROM windowed w2
        |                         WHERE w2.l_partkey = w.l_partkey))
        |ORDER BY s_suppkey""".stripMargin)
    assert(canon(engine) === canon(correlated))
    assert(engine.count() > 0)
  }

  /** All join nodes of the STATIC plan (AQE off for the planning pass —
    * the PartitionPruneSpec pattern; executed query stages hide join
    * nodes from collect). `mk` is a thunk so planning happens under the
    * disabled flag. */
  private def joinNodes(
      mk: => DataFrame): Seq[org.apache.spark.sql.execution.joins.BaseJoinExec] = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q164 exact Q4: EXISTS decorrelates to ONE left-semi join; q73's plan is unchanged") {
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    // the exact-shape query: exactly one join, left-semi, never a
    // nested loop (the inner two-column predicate must sit BELOW it)
    val q4Joins = joinNodes(Relational.tpchQ4(orders, lineitem))
    assert(q4Joins.length === 1, s"expected 1 join, got: $q4Joins")
    assert(q4Joins.head.joinType === org.apache.spark.sql.catalyst.plans.LeftSemi)
    assert(!q4Joins.head.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
    // adding the date window must not have disturbed the -style twin:
    // q73 still plans the same single left-semi shape
    val q73Joins = joinNodes(Relational.existsSubquery(orders, lineitem))
    assert(q73Joins.length === 1)
    assert(q73Joins.head.joinType === org.apache.spark.sql.catalyst.plans.LeftSemi)
    // and the window is strict: Q4 scans a quarter, q73 scans all orders
    val q4n = Relational.tpchQ4(orders, lineitem)
      .agg(org.apache.spark.sql.functions.sum("order_count")).collect()(0).getLong(0)
    val q73n = Relational.existsSubquery(orders, lineitem)
      .agg(org.apache.spark.sql.functions.sum("n_orders")).collect()(0).getLong(0)
    assert(q4n > 0 && q4n < q73n)
  }

  test("q163 exact Q1: one aggregation pass, pushed shipdate filter, derived avgs") {
    val lineitem = Tables(spark, dir, "lineitem")
    val q1 = Relational.tpchQ1(lineitem)
    val rows = q1.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sumQty, avgQty, n) =
        (r.getDouble(2), r.getDouble(6), r.getLong(9))
      assert(math.abs(avgQty - sumQty / n) < 1e-6,
        "avg must be the derived sum/count of the same pass")
      // charge ≥ disc_price ≥ 0 (tax and discount are non-negative)
      assert(r.getDouble(5) >= r.getDouble(4))
    }
    // the cutoff must reach the parquet scan as a pushed filter
    val scan = q1.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"),
      s"shipdate cutoff not pushed:\n$scan")
    // exactly one shuffle: the groupBy — no extra exchange for the avgs
    val exchanges = q1.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 2, // agg + the orderBy range partition
      s"unexpected exchanges: ${exchanges.length}")
  }

  test("q167 exact Q14: pushed month window, broadcast part, share in [0,100]") {
    val q14 = Relational.tpchQ14(
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "part"))
    val plan = q14.queryExecution.executedPlan.toString
    // the one-month window reaches the lineitem parquet scan
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"shipdate window not pushed:\n$plan")
    // part rides a broadcast — the fact side never shuffles for the join
    assert(plan.contains("BroadcastHashJoin"), s"part not broadcast:\n$plan")
    val rows = q14.collect()
    assert(rows.length === 1)
    val share = rows(0).getDouble(0)
    assert(share >= 0.0 && share <= 100.0, s"promo share out of range: $share")
    // the only shuffle is the one-row-per-task global-agg merge
    val exchanges = q14.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 1, s"unexpected exchanges: ${exchanges.length}")
  }
}
