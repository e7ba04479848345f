package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `size(array_intersect(a, b))` specialized for SORTED INT arrays:
  * a zero-allocation two-pointer merge, generated into whole-stage
  * codegen via `doGenCode`.
  *
  * The built-in `array_intersect` builds a hash set per row and
  * materializes the intersection array just to take its size — in the
  * near-dup verify loops (q18/q22/q24) that per-pair cost dominates the
  * whole query. Preconditions: both inputs ascending-sorted,
  * duplicate-free (the dictionary-encoded sets from Dedup.intSets are
  * exactly that). This is preference path (b) of the custom-operator
  * ladder: a scalar Expression, not a new plan node — Catalyst still
  * owns join strategy and codegen around it.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<INT> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getInt(i); val yv = y.getInt(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |int $i = 0, $j = 0;
         |final int $nx = $a.numElements(), $ny = $b.numElements();
         |long ${ev.value}Acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final int xv = $a.getInt($i);
         |  final int yv = $b.getInt($j);
         |  if (xv == yv) { ${ev.value}Acc++; $i++; $j++; }
         |  else if (xv < yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSorted {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectCountSorted(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
