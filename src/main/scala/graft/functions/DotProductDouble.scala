package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two ARRAY<DOUBLE> columns as a tight primitive loop,
  * generated into whole-stage codegen via `doGenCode`.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: higher-order
  * functions are interpreted (no codegen) and box every element, which
  * made the round-1 q25 plan evaluate an interpreted 64-element lambda
  * fold per candidate pair INSIDE a BroadcastNestedLoopJoin condition —
  * 9.67 s at sf0.1 vs 1.8 s profiled (VERDICT r1 §What's wrong #2).
  *
  * Accumulation order is the identical left fold
  * `((0 + a0·b0) + a1·b1) + …` in f64, so results stay bit-identical to
  * both the HOF form it replaces and DuckDB's `list_reduce` oracle
  * mirror (SparkEntry.dotSql) — the hash-compare gate depends on this.
  *
  * Contract for equal-length, null-free arrays (embeddings are
  * fixed-dim): identical to the HOF form. Deliberate divergences
  * outside that contract, for SQL callers via GraftExtensions: on
  * UNEQUAL lengths this returns the partial dot over the shorter
  * prefix where the zip_with form returns NULL (zip_with null-pads the
  * shorter side and the fold nulls out); null ELEMENTS are read as
  * unspecified primitives rather than propagating NULL. Both are the
  * useful semantics for a vector kernel, but they are not the HOF's.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<DOUBLE> inputs, " +
          s"got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "dot_product_double"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductDouble {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductDouble(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
