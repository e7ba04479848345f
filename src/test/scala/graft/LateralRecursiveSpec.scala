package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.operators.Relational
import graft.sources.Tables

/** The two Spark-4 SQL-text surfaces added in round 7: correlated
  * LATERAL (ORDER BY + LIMIT) and WITH RECURSIVE — both must plan as
  * set-oriented operators, never per-row re-execution. */
class LateralRecursiveSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q174 lateral top-n decorrelates: window + join, no nested loop") {
    val q = Relational.lateralTopOrders(
      Tables(spark, dir, "customer"), Tables(spark, dir, "orders"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q.queryExecution.executedPlan
      // the per-customer subquery must NOT execute per row
      assert(plan.collect {
        case b: BroadcastNestedLoopJoinExec => b
        case c: CartesianProductExec => c
      }.isEmpty, s"lateral degenerated:\n$plan")
      // the limit becomes a rank-style window over one orders pass
      assert(plan.toString.contains("Window"),
        s"no window in the decorrelated plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // per-customer cardinality contract: ≤ k rows each, ordered
    val rows = q.collect()
    val perCust = rows.groupBy(_.getLong(0)).values
    assert(perCust.forall(_.length <= 2))
    assert(perCust.exists(_.length == 2), "no customer has 2+ orders?")
    perCust.filter(_.length == 2).foreach { r =>
      assert(r(0).getDouble(2) >= r(1).getDouble(2), "lateral order broken")
    }
  }

  test("q175 recursion generates the exact contiguous month spine") {
    val orders = Tables(spark, dir, "orders")
    val got = Relational.recursiveMonthlyRevenue(orders).collect()
    val months = got.map(_.getString(0)).toList
    // contiguous: every consecutive pair is exactly one month apart
    def next(m: String): String = {
      val Array(y, mo) = m.split("-").map(_.toInt)
      if (mo == 12) f"${y + 1}%04d-01" else f"$y%04d-${mo + 1}%02d"
    }
    months.sliding(2).foreach {
      case List(a, b) => assert(next(a) === b, s"gap between $a and $b")
      case _ =>
    }
    // the spine covers min..max order months even if some are empty;
    // zero-filled months carry revenue 0 and n_orders 0
    got.filter(_.getLong(2) == 0L).foreach(r =>
      assert(r.getDouble(1) === 0.0, "empty month not zero-filled"))
    // total revenue across the spine equals the plain aggregate
    val direct = orders.agg(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions.col("o_totalprice")
          .cast("decimal(18,2)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(got.map(_.getDouble(1)).sum - direct) < 1e-6)
  }
}
