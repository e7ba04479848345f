package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `size(array_intersect(a, b))` specialized for SORTED integer arrays
  * (INT or LONG elements — both sides the same): a zero-allocation
  * two-pointer merge, generated into whole-stage codegen via
  * `doGenCode`.
  *
  * The built-in `array_intersect` builds a hash set per row and
  * materializes the intersection array just to take its size — in the
  * near-dup verify loops (q18/q22/q24) that per-pair cost dominates the
  * whole query. Preconditions: both inputs ascending-sorted,
  * duplicate-free (the hash-encoded sets from Dedup.hashSets are
  * exactly that). This is preference path (b) of the custom-operator
  * ladder: a scalar Expression, not a new plan node — Catalyst still
  * owns join strategy and codegen around it.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private lazy val elemIsLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(e @ (IntegerType | LongType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two ARRAY<INT> or two ARRAY<BIGINT> inputs, " +
            s"got ${left.dataType} / ${right.dataType}")
    }
  }
  override def prettyName: String = "intersect_count_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = if (elemIsLong) x.getLong(i) else x.getInt(i).toLong
      val yv = if (elemIsLong) y.getLong(j) else y.getInt(j).toLong
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
      val get = if (elemIsLong) "getLong" else "getInt"
      s"""
         |int $i = 0, $j = 0;
         |final int $nx = $a.numElements(), $ny = $b.numElements();
         |long ${ev.value}Acc = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long xv = $a.$get($i);
         |  final long yv = $b.$get($j);
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
