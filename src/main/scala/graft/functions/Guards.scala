package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared HEADROOM GUARD for the operators whose scaladocs document a
  * BIGINT overflow bound as prose (q214's AUC numerator, q227's lift,
  * q235's KS numerator, q250's Gini numerator — each a product of
  * exact integer aggregates that is safe at any realistic corpus but
  * has a stated ceiling). Round-10 verdict #7: the bound should be an
  * ENFORCED check with an error that names itself and its fix, not a
  * comment — under ANSI mode Spark would throw an anonymous
  * ARITHMETIC_OVERFLOW from somewhere inside the plan, and with ANSI
  * off it would WRAP SILENTLY (a wrong negative lift is worse than an
  * error); DuckDB, which always raises on BIGINT overflow, would
  * diverge from the silent-wrap engine exactly at the documented
  * ceiling.
  *
  * [[headroomMul]] is an overflow-CHECKED multiply: the pre-check
  * `|a| > Long.Max / |b|` is itself overflow-free, evaluates inline
  * in whole-stage codegen (a `when`/`raise_error` over the existing
  * expressions — zero cost until it fires), and the error names WHICH
  * documented bound broke and the DECIMAL(38,0) promotion that fixes
  * it. When the guard does not fire the column is exactly `a * b`, so
  * oracle hashes are untouched. */
object Guards {

  /** `a * b` (BIGINT), or a named error when the product would
    * overflow. `what` names the operator and expression, e.g.
    * `"q227 lift sup_ab*n_baskets"`. */
  def headroomMul(a: Column, b: Column, what: String): Column =
    when(b =!= 0L && abs(a) > lit(Long.MaxValue) / abs(b),
      raise_error(lit(
        s"GRAFT_HEADROOM[$what]: BIGINT product would overflow " +
          "(the bound documented in the operator's scaladoc); " +
          "promote this expression to DECIMAL(38,0) — and its oracle " +
          "SQL identically — to run past it")).cast("long"))
      .otherwise(a * b)
}
