package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Posting-list merge as a typed `Aggregator[IN, BUF, OUT]` — the
  * reference's reduce-side merge (`/root/reference/main.c++:190-203`)
  * in UDAF form. The expression form
  * (`sort_array(collect_set(doc_id))`, InvertedIndex.postings) is the
  * production path; this typed twin exists because SURVEY §2.B reserves
  * the `Aggregator` route for object-state aggregations, and q37 proves
  * both produce hash-identical output.
  *
  * Input rows are pre-deduped (doc-distinct) so `reduce` is a plain
  * append; `merge` concatenates partial buffers (the reference's
  * partial lists, `main.c++:141`); `finish` dedups + sorts exactly like
  * the bubble-sorted output (`main.c++:240-252`), once per group.
  */
class PostingsAggregator extends Aggregator[(String, Long), Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], in: (String, Long)): Seq[Long] = buf :+ in._2
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = a ++ b
  override def finish(buf: Seq[Long]): Seq[Long] = buf.distinct.sorted
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
