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

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

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
