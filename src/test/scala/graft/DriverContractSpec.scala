package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** The driver-comparator contract, enforced as a test so the q89 class
  * of regression (round 3's one red CORRECTNESS row: an ARRAY-typed
  * output column that pandas cannot sort/hash) cannot recur silently.
  *
  * Contract (SparkEntry Scaladoc): every `queries` output column must
  * be a scalar the driver can sort and hash — no Array, Map, or Struct
  * types. Arrays ship as delimited strings (q02/q37/q89 precedent).
  */
class DriverContractSpec extends SparkSpec {

  test("no driver query output column is Array/Map/Struct-typed") {
    // plan-only mode: the schema contract needs analysis, not results —
    // eagerMaterialize=false keeps the checkpoint-happy dedup/ANN
    // operators lazy so this stays a type check, not a suite execution
    // (the clusterLabels loops still run eagerly by construction; that
    // residual cost is bounded by the sf0.001 fixture).
    spark.conf.set("spark.graft.eagerMaterialize", "false")
    val offenders =
      try SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
        fn(spark, testdataDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      } finally {
        spark.conf.set("spark.graft.eagerMaterialize", "true")
        operators.Dedup.releaseLazyHandles() // lazy-mode persists are registered
      }
    assert(offenders.isEmpty,
      s"driver comparator cannot hash these columns: ${offenders.mkString(", ")}")
  }

  test("oracleSql covers every query except the documented HLL exception") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q39_approx_distinct"),
      s"queries without an oracle (only q39 is allowed): $noOracle")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracleSql entries with no query: $orphaned")
  }
}
