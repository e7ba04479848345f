package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

import graft.sources.Tables

/** Cost-based-optimizer robustness: a real 100 TB deployment runs with
  * `spark.sql.cbo.enabled=true` over ANALYZE-collected statistics, so
  * the suite's hand-hinted, plan-audited join shapes must HOLD (or
  * only improve) under CBO + join reorder — not silently degrade into
  * shapes the audit never saw. The four deepest join towers
  * (q100/q121/q139/q150 = TPC-H Q5/Q7/Q8/Q9) run twice over the SAME
  * catalog tables with full column stats — CBO off vs CBO+reorder on —
  * and the spec asserts result equality, an unchanged broadcast-join
  * count floor, and zero nested-loop joins either way.
  *
  * The fixtures are saved once as catalog tables (`ANALYZE TABLE`
  * works on the catalog, not on path reads) at sf0.001 — stats-driven
  * PLANNING depends on relative table sizes, which are scale-invariant
  * across the sf ladder. */
class CboSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val tables =
    Seq("region", "nation", "customer", "supplier", "orders", "lineitem", "part")

  /** Saved + analyzed once per suite run. Column stats are collected
    * for every column EXCEPT TIMESTAMP_NTZ ones: Spark 4.1's
    * `FilterEstimation.evaluateBinary` has no case for TimestampNTZType
    * and MatchErrors the whole optimization phase when an NTZ column
    * carries stats and appears in a filter (hit via o_orderdate /
    * l_shipdate here). Leaving those columns unanalyzed keeps CBO on
    * the default-selectivity path for them — the deployment-safe
    * configuration until upstream adds the case. */
  private lazy val catalog: Map[String, DataFrame] = {
    tables.foreach { t =>
      val name = s"graft_cbo_$t"
      if (!spark.catalog.tableExists(name)) {
        val df = Tables(spark, dir, t)
        df.write.mode("overwrite").saveAsTable(name)
        val safeCols = df.schema.fields
          .filterNot(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
          .map(_.name)
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS " +
          s"FOR COLUMNS ${safeCols.mkString(", ")}")
      }
    }
    tables.map(t => t -> spark.table(s"graft_cbo_$t")).toMap
  }

  private def queries: Map[String, () => DataFrame] = Map(
    "q100_tpch_q5" -> (() => operators.Relational.tpchQ5(
      catalog("region"), catalog("nation"), catalog("customer"),
      catalog("supplier"), catalog("orders"), catalog("lineitem"))),
    "q121_tpch_q7" -> (() => operators.Relational.tpchQ7(
      catalog("nation"), catalog("customer"), catalog("supplier"),
      catalog("orders"), catalog("lineitem"))),
    "q139_tpch_q8" -> (() => operators.Relational.tpchQ8(
      catalog("region"), catalog("nation"), catalog("customer"),
      catalog("supplier"), catalog("orders"), catalog("lineitem"),
      catalog("part"))),
    "q150_tpch_q9" -> (() => operators.Relational.tpchQ9(
      catalog("part"), catalog("supplier"), catalog("lineitem"),
      catalog("orders"), catalog("nation"))))

  private def withCbo[A](on: Boolean)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    keys.foreach(k => spark.conf.set(k, on.toString))
    try body finally keys.foreach(k => spark.conf.set(k, "false"))
  }

  /** Join nodes of the static plan (AQE off — stages hide joins). */
  private def joins(mk: => DataFrame): (Seq[BaseJoinExec], Array[org.apache.spark.sql.Row]) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = mk
      (df.queryExecution.executedPlan.collect { case j: BaseJoinExec => j },
        df.collect())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  for ((name, mk) <- queries)
    test(s"$name: audited join shape survives CBO + join reorder over full stats") {
      val (off, offRows) = withCbo(on = false) { joins(mk()) }
      val (on, onRows) = withCbo(on = true) { joins(mk()) }
      // 1. same answer
      assert(onRows.map(_.toString).toSeq === offRows.map(_.toString).toSeq)
      // 2. stats never demote a broadcast: at least as many BHJs
      def bhj(js: Seq[BaseJoinExec]) =
        js.count(_.isInstanceOf[BroadcastHashJoinExec])
      assert(bhj(on) >= bhj(off),
        s"CBO demoted broadcasts: ${bhj(off)} -> ${bhj(on)}")
      // 3. no plan degenerates into a nested loop under either mode
      assert(!(on ++ off).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
      // 4. the join COUNT is stable (reorder may permute, not multiply)
      assert(on.length === off.length)
    }

  test("stats are actually present (rowCount + column stats exist)") {
    catalog // force save+analyze
    // rowCount/attributeStats surface through the plan only when the
    // CBO stats visitor runs (size-only visitor otherwise)
    withCbo(on = true) {
      val stats = spark.table("graft_cbo_lineitem").queryExecution
        .optimizedPlan.stats
      assert(stats.rowCount.nonEmpty, "ANALYZE did not attach a rowCount")
      val li = Tables(spark, dir, "lineitem")
      assert(stats.rowCount.get.toLong === li.count())
      assert(stats.attributeStats.nonEmpty,
        "FOR COLUMNS did not attach column-level stats")
    }
  }

  test("runtime bloom filter injects on the shuffled fact join and agrees") {
    // the other runtime-filtering deployment mode (besides DPP/q168):
    // Spark 4 injects a bloom-filter semi-reduction on the big side of
    // a shuffle join when the other side carries a selective filter.
    // Thresholds are lowered so the sf0.001 fixture qualifies; the
    // assertion is the query-level contract a 100 TB run relies on —
    // injection happens AND does not change the answer.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def q = {
      val li = Tables(spark, dir, "lineitem")
      val ord = Tables(spark, dir, "orders")
        .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val withBloom = q
      val planStr = withBloom.queryExecution.optimizedPlan.toString
      assert(planStr.contains("might_contain"),
        s"no bloom filter injected:\n$planStr")
      val a = withBloom.collect().map(_.toString).sorted
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val b = q.collect().map(_.toString).sorted
      assert(a.sameElements(b), "bloom-filtered result diverged")
      assert(a.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
