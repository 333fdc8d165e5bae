package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact top-k of (score, id) pairs per group — the
  * `Aggregator[IN, BUF, OUT]` form of the two-phase top-k used by
  * [[graft.operators.Similarity]] (SURVEY.md §2.3 UDAF row).
  *
  * The buffer is a bounded sorted vector (size ≤ k), so partial
  * aggregation keeps at most k candidates per partition and the merge is
  * a k+k merge — the same partial/final shape Spark's HashAggregate gives
  * built-in aggregates, with no per-group window shuffle. Ordering is
  * (score DESC, id ASC): fully deterministic under any partitioning.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size == k && !better(x, buf.last)) buf
    else {
      val i = buf.indexWhere(e => better(x, e)) match {
        case -1 => buf.size
        case n  => n
      }
      val v = (buf.take(i) :+ x) ++ buf.drop(i)
      if (v.size > k) v.take(k) else v
    }
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
