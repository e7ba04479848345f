package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductDouble, IntersectCountSorted, PolyHashString}

/** Session integration for the engine's custom expressions.
  *
  * Two registration paths:
  *  - `withExtensions(new GraftExtensions)` at session build time (the
  *    `SparkSessionExtensions` mechanism — also usable via
  *    `spark.sql.extensions=graft.GraftExtensions`), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * Either way `intersect_count_sorted(a, b)` and
  * `dot_product_double(a, b)` become callable from SQL text, so
  * `spark.sql(...)` users get the same codegen'd operators as the
  * Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("intersect_count_sorted"),
      new ExpressionInfo(classOf[IntersectCountSorted].getName, "intersect_count_sorted"),
      (exprs: Seq[Expression]) => IntersectCountSorted(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product_double"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "dot_product_double"),
      (exprs: Seq[Expression]) => DotProductDouble(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHashString].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHashString(exprs(0))))
    e.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
  }
}

object GraftExtensions {
  /** Live-session twin of `injectOptimizerRule` (extensions only apply
    * at session build): appends [[graft.plans.IntersectCountRewrite]]
    * to `spark.experimental.extraOptimizations`, idempotently. */
  def enableRewrites(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.IntersectCountRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IntersectCountRewrite

  def register(spark: SparkSession): Unit = {
    GraftColumnBridge.registerExpression(spark, "intersect_count_sorted",
      exprs => IntersectCountSorted(exprs(0), exprs(1)))
    GraftColumnBridge.registerExpression(spark, "dot_product_double",
      exprs => DotProductDouble(exprs(0), exprs(1)))
    GraftColumnBridge.registerExpression(spark, "poly_hash",
      exprs => PolyHashString(exprs(0)))
  }
}
