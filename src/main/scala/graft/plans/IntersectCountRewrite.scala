package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  ArrayDistinct, ArrayIntersect, Cast, Expression, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

import graft.functions.IntersectCountSorted

/** Optimizer rule: `size(array_intersect(a, b))` over null-free
  * INT/LONG arrays → the codegen'd two-pointer
  * `intersect_count_sorted(sort_array(array_distinct(a)), …)`.
  *
  * This is the q18/q22/q24 hot-loop specialization (PLANS.md measured
  * the expression-level swap at 2.5×) surfaced as a PLAN REWRITE, so
  * SQL-text users who write the idiomatic `size(array_intersect(…))`
  * get the fast operator without knowing it exists — preference path
  * (c) of the custom-operator ladder (a `Rule[LogicalPlan]`), wired
  * through both `SparkSessionExtensions.injectOptimizerRule` (build
  * time) and `spark.experimental.extraOptimizations` (live session).
  *
  * Soundness, for ANY matching input:
  *  - `array_intersect` returns the DISTINCT common elements, so its
  *    size equals the count of distinct shared values;
  *    `array_distinct` + `sort_array` establish exactly the
  *    duplicate-free ascending precondition under which
  *    `IntersectCountSorted` counts distinct shared values.
  *  - gated on `containsNull = false` ON THE TYPE (the merge reads
  *    primitive arrays; a null element would change semantics).
  *  - gated on `legacySizeOfNull = false` (the modern default):
  *    size(NULL) must be NULL, which the rewritten form preserves; the
  *    legacy -1 convention would not survive the rewrite.
  *  - `Size` returns INT, `IntersectCountSorted` LONG — the cast back
  *    is exact for any array Spark can hold (< 2³¹ elements).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def nullFreeIntArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, false) | ArrayType(LongType, false) => true
    case _ => false
  }

  private def sortedDistinct(e: Expression): Expression =
    new SortArray(ArrayDistinct(e))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(ArrayIntersect(a, b), legacy)
          if !legacy && s.resolved &&
            nullFreeIntArray(a.dataType) && nullFreeIntArray(b.dataType) =>
        Cast(IntersectCountSorted(sortedDistinct(a), sortedDistinct(b)),
          IntegerType)
    }
}
