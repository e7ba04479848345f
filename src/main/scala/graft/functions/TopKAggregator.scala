package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded grouped TOP-K as a typed `Aggregator` — the SCALE
  * alternative to the window formulation `row_number() OVER
  * (PARTITION BY g ORDER BY …) <= k`, which shuffles and SORTS every
  * row of every group to keep k of them. This aggregator's state is
  * at most k (value, id) pairs per group at every stage, so the heavy
  * lifting happens MAP-SIDE (partial aggregation keeps only k per
  * group per partition) and the exchange moves k rows per group
  * instead of the group's whole population — the difference between
  * shuffling 100 TB and shuffling k·|groups| rows.
  *
  * Ordering is total and deterministic: value DESC, then id ASC on
  * ties — the same (value, −id) ordering the oracle's window states,
  * so both engines pick identical survivors. The buffer is kept
  * sorted-truncated on every reduce/merge; k is a constructor
  * parameter, so the state bound is a compile-time contract, not a
  * convention. q157 proves the aggregator ≡ the window formulation by
  * oracle hash. */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** Spark SQL's double ordering, descending: NaN sorts as the
    * LARGEST value and -0.0 compares equal to 0.0 (Spark normalizes
    * signed zeros in sort keys) — `sortBy(-v)` would diverge on both
    * (-NaN is NaN, which Scala's total order puts last; -0.0 < 0.0).
    * Ties break by ascending id, making the pick total. */
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    private def norm(v: Double) = if (v == 0.0) 0.0 else v // -0.0 -> 0.0
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(b._1), norm(a._1)) // DESC
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] = trim(buf :+ in)
  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
