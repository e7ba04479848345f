package graft

import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.Relational

/** `NOT IN (subquery)` three-valued-logic semantics (q149, TPC-H Q16
  * shape): the plan must keep a NULL-AWARE anti join — a plain LeftAnti
  * equi-join would silently return rows whenever the subquery contains
  * a NULL, which SQL defines as an EMPTY result (every membership test
  * is UNKNOWN). Both the plan node and the data semantics are pinned.
  */
class NullAwareAntiSpec extends SparkSpec {
  import spark.implicits._

  private val part = Seq(
    (1L, "a", "Brand#1", "SMALL", 3),
    (2L, "b", "Brand#1", "LARGE", 11),
    (3L, "c", "Brand#2", "SMALL", 3)) // excluded brand
    .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size")
  private val lineitem = Seq(
    (100L, 1L, 10L), (100L, 1L, 20L), (101L, 2L, 10L), (101L, 3L, 30L))
    .toDF("l_orderkey", "l_partkey", "l_suppkey")

  private def supplier(balances: Seq[(java.lang.Long, Double)]) =
    balances.toDF("s_suppkey", "s_acctbal")

  /** All physical join nodes, looking through AQE wrappers. */
  private def joins(df: org.apache.spark.sql.DataFrame) = {
    val plan = df.queryExecution.executedPlan
    val root = plan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(plan)
    root.collect {
      case b: BroadcastHashJoinExec => b
      case b: BroadcastNestedLoopJoinExec => b
    }
  }

  test("q149 plans a null-aware anti join, not a plain LeftAnti") {
    val df = Relational.tpchQ16(part,
      supplier(Seq((10L: java.lang.Long) -> -5.0, (99L: java.lang.Long) -> 1.0)),
      lineitem)
    val naaj = joins(df).exists {
      case b: BroadcastHashJoinExec => b.isNullAwareAntiJoin
      // multi-column / non-broadcastable NOT IN falls back to a
      // nested-loop anti with the OR-isnull condition — also null-aware
      case b: BroadcastNestedLoopJoinExec =>
        b.condition.exists(_.toString.toLowerCase.contains("isnull"))
    }
    assert(naaj, s"expected a null-aware anti join in:\n" +
      df.queryExecution.executedPlan.toString)
    // supplier 10 is excluded: part 1 keeps only supplier 20, part 2
    // keeps nothing (its only supplier is 10), brand#2 is filtered
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq === Seq(("Brand#1", "SMALL", 3, 1L)))
  }

  test("one NULL in the NOT IN subquery empties the result (3VL)") {
    // a NULL s_suppkey among the excluded rows: x NOT IN (…, NULL) is
    // never TRUE, so every probe row drops — the day-one SQL trap
    val df = Relational.tpchQ16(part,
      supplier(Seq((10L: java.lang.Long) -> -5.0, (null: java.lang.Long) -> -1.0)),
      lineitem)
    assert(df.count() === 0L)
  }

  test("an empty exclusion set keeps every probe row") {
    val df = Relational.tpchQ16(part,
      supplier(Seq((99L: java.lang.Long) -> 50.0)), lineitem)
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      ("Brand#1", "SMALL", 3, 2L), ("Brand#1", "LARGE", 11, 1L)))
  }

  // ---- q161: the TUPLE form — the nested-loop null-aware fallback ----

  /** (l_partkey, l_suppkey, l_returnflag, l_linestatus, l_quantity,
    * l_orderkey) — orderkey inside the exclusion's fixed key range. */
  private def li(rows: Seq[(java.lang.Long, java.lang.Long, String)]) =
    rows.map { case (p, s, rf) => (p, s, rf, "O", 50.0, 1L) }
      .toDF("l_partkey", "l_suppkey", "l_returnflag", "l_linestatus",
        "l_quantity", "l_orderkey")

  test("q161 tuple NOT IN plans the null-aware NESTED-LOOP fallback") {
    val df = Relational.tupleNotIn(li(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, "N"),
      (1L: java.lang.Long, 20L: java.lang.Long, "R"),
      (2L: java.lang.Long, 10L: java.lang.Long, "N"))))
    // the tuple rewrite is non-equi (OR of isnulls) — it MUST be a
    // BroadcastNestedLoopJoin carrying the isnull condition, and must
    // NOT take the single-column BHJ isNullAwareAntiJoin path
    val bnlj = joins(df).collect {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.nonEmpty, s"expected BroadcastNestedLoopJoin in:\n" +
      df.queryExecution.executedPlan.toString)
    assert(bnlj.exists(
      _.condition.exists(_.toString.toLowerCase.contains("isnull"))),
      "the anti condition must carry the 3VL isnull branches")
    // (1,20) is excluded (returned at qty>=49); (1,10) and (2,10) stay
    val rows = df.collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq === Seq(("N", 2L)))
  }

  test("q161: a NULL exclusion component drops exactly the probes it could match") {
    // tuple 3VL differs from single-column: (1,10) = (NULL,20) is FALSE
    // (the 10=20 component refutes it), NOT unknown — so a NULL in the
    // exclusion set does NOT empty the result the way q149's does. It
    // only poisons probes no component can refute: (1,10) vs (NULL,10)
    // is UNKNOWN AND TRUE = UNKNOWN -> that probe drops.
    val df = Relational.tupleNotIn(li(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, "N"),
      (2L: java.lang.Long, 20L: java.lang.Long, "N"),
      (null: java.lang.Long, 10L: java.lang.Long, "R"))))
    // exclusion tuple (NULL,10): probe (1,10) -> UNKNOWN -> dropped;
    // probe (2,20) -> FALSE -> kept. The R probe row (NULL,10) is also
    // UNKNOWN against itself -> dropped.
    val rows = df.collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq === Seq(("N", 1L)))
  }

  test("q161: a NULL probe column drops the row only when unrefuted") {
    val df = Relational.tupleNotIn(li(Seq(
      (null: java.lang.Long, 20L: java.lang.Long, "N"), // UNKNOWN vs (2,20)
      (null: java.lang.Long, 30L: java.lang.Long, "N"), // FALSE (30<>20): kept
      (2L: java.lang.Long, 20L: java.lang.Long, "R"))))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq === Seq(("N", 1L)))
  }

  test("q161: an empty exclusion set keeps every probe row") {
    val df = Relational.tupleNotIn(li(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, "N"),
      (2L: java.lang.Long, 20L: java.lang.Long, "N"))))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(2)))
    assert(rows.toSeq === Seq(("N", 2L)))
  }
}
