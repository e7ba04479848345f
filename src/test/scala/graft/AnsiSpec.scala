package graft

import org.apache.spark.sql.functions._

/** The suite runs under Spark 4's ANSI default: invalid operations
  * THROW instead of silently producing NULLs — the mode a production
  * deployment wants (a silent NULL in a 100 TB aggregate is
  * unfindable; an error names the row). This spec formalizes that
  * posture and pins the sanctioned `try_*` escape hatches for the
  * places where null-on-error is the intended semantics. Every
  * operator in the suite was built (and is gated) under this mode —
  * e.g. Bpe guards its `element_at` bounds with lazy CASE branches
  * rather than relying on out-of-range returning NULL. */
class AnsiSpec extends SparkSpec {
  import spark.implicits._

  test("the session runs ANSI mode (the Spark 4 default)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true",
      "the whole suite's error discipline assumes ANSI on")
  }

  test("invalid operations throw; their try_* twins return NULL") {
    val one = Seq(1).toDF("x")
    // out-of-range array index (SparkArrayIndexOutOfBoundsException —
    // the ANSI error classes vary per operation, all are exceptions)
    intercept[Exception] {
      one.select(element_at(array(lit(1), lit(2)), lit(9))).collect()
    }
    assert(one.select(try_element_at(array(lit(1), lit(2)), lit(9)))
      .collect()(0).isNullAt(0))
    // integer division by zero
    intercept[Exception] {
      one.selectExpr("CAST(1 AS LONG) div 0").collect()
    }
    assert(one.select(try_divide(lit(1L), lit(0L))).collect()(0).isNullAt(0))
    // arithmetic overflow
    intercept[Exception] {
      one.select(lit(Long.MaxValue) + lit(1L)).collect()
    }
    assert(one.select(try_add(lit(Long.MaxValue), lit(1L)))
      .collect()(0).isNullAt(0))
    // malformed cast
    intercept[Exception] {
      one.select(lit("not a number").cast("int")).collect()
    }
    assert(one.selectExpr("try_cast('not a number' AS INT)")
      .collect()(0).isNullAt(0))
  }
}
