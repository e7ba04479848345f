package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared Spark-side hot loop for [[PolyHashString]] — a plain
  * compiled method so interpreted eval and generated code run the exact
  * same fold. Fast path iterates UTF-8 bytes directly (no String
  * allocation) when the input is pure ASCII; otherwise falls back to
  * CODEPOINTS — the HOF spec it replaces (`aggregate(split(s, ""), …,
  * ascii(ch))`) folds one `ascii()` per split element, `split` keeps
  * surrogate pairs together, and `ascii` returns the full codepoint
  * (calibrated empirically: "a𝄞b" folds 97,119070,98 →
  * 3784485 — a UTF-16 code-unit fold would give 57834039 and diverge
  * from both the spec and DuckDB's per-character `ascii()`). */
object PolyHashUtil {
  final val P: Long = TextFns.HashP

  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else { acc = (acc * 31 + b) % P; i += 1 }
    }
    if (ascii) acc
    else {
      val str = s.toString
      acc = 0L
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      acc
    }
  }
}

/** `polyHash(s)` — the cross-engine polynomial string hash
  * `fold(acc*31 + charCode mod 1e9+7)` as a codegen'd unary expression.
  *
  * Replaces the round-1 `aggregate(split(s, ""), …)` form: splitting a
  * string into one-char strings and folding with a higher-order
  * function is interpreted and allocates per character — and it sits in
  * the per-token hot path of MinHash (q22), SimHash (q23),
  * fingerprints (q30) and split assignment (q45). The fold order and
  * modulus are identical, so the result — and therefore the DuckDB
  * oracle mirror (`SparkEntry.polyHashSql`, a `list_reduce` over
  * `ascii()` codes) — is unchanged bit for bit.
  */
case class PolyHashString(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a STRING input, got $other")
    }
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHashUtil.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashUtil.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHashString {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.column(PolyHashString(GraftColumnBridge.expression(c)))
}
