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
    e.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_tokenize"),
      GraftExtensions.tokenizeBuilder))
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
    GraftColumnBridge.registerExpression(spark, "graft_tokenize",
      tokenizeBuilder)
  }

  /** `graft_tokenize(text)` — the engine's tokenize→normalize→filter
    * chain as a SQL-text function: the SAME codegen'd built-in tree the
    * Column API (`TextFns.orderedWordsOf`) analyzes to —
    * `filter(transform(split(text,'\s+'), w -> lower(regexp_replace(
    * w,'[^A-Za-z]',''))), v -> v <> '')` — built directly in Catalyst
    * nodes (a Column→Expression bridge would splice an opaque
    * `ColumnNodeExpression` the SQL analyzer never unwraps). NOT a UDF:
    * every node is a codegen'd built-in, so the SQL surface stays in
    * WholeStageCodegen exactly like the Column path. FunctionsSpec pins
    * node-class shape equality between the two surfaces; q162
    * hash-gates the result against q01's oracle. */
  private[graft] val tokenizeBuilder: Seq[Expression] => Expression = { exprs =>
    import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, ArrayTransform, EqualTo, LambdaFunction, Literal, Lower, Not, RegExpReplace, StringSplit, UnresolvedNamedLambdaVariable}
    val w = UnresolvedNamedLambdaVariable(Seq("graft_tok_w"))
    val v = UnresolvedNamedLambdaVariable(Seq("graft_tok_v"))
    ArrayFilter(
      ArrayTransform(
        StringSplit(exprs(0), Literal("\\s+"), Literal(-1)),
        LambdaFunction(
          Lower(RegExpReplace(w, Literal("[^A-Za-z]"), Literal(""))), Seq(w))),
      LambdaFunction(Not(EqualTo(v, Literal(""))), Seq(v)))
  }
}
