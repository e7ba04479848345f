package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) keys in pure built-in Column arithmetic — the
  * multi-dimensional CLUSTERING primitive: sorting a table by the
  * bit-interleaving of two keys places rows close in BOTH dimensions
  * into the same row groups, so a parquet min/max footer admits a
  * predicate on EITHER dimension to a small fraction of row groups —
  * where a single-key sort clusters one dimension and scatters the
  * other across every row group. At 100 TB this is the difference
  * between scanning ~√f and ~all files for the secondary dimension.
  *
  * The interleave is the standard mask-and-shift bit spread (5 steps
  * per operand), all `shiftleft`/`bitwiseAND`/`bitwiseOR` on LONG —
  * codegen'd end-to-end, no UDF; the oracle replicates the identical
  * mask chain in DuckDB integer arithmetic, so the key is
  * oracle-gated bit-for-bit (q159). Inputs are restricted to 31 bits
  * (`& 0x7FFFFFFF`) so the interleaved key stays in the positive LONG
  * range and SORTS correctly.
  */
object ZOrder {

  /** Every second bit of the lower 31 bits of `c`, spread across 62. */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x7FFFFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** The Morton interleave of (a, b): a's bits on even positions, b's
    * on odd. Total-orders pairs along the Z space-filling curve. */
  def mortonKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
}
