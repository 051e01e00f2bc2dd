package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored record for top-k-per-group aggregation. */
case class Scored(id: Long, score: Double)

/** Typed UDAF (SURVEY.md §7.3): bounded top-k per group as an
  * `Aggregator[Scored, Seq[Scored], Seq[Scored]]`.
  *
  * Spark 4's window path already does partial top-k before the shuffle
  * (`WindowGroupLimit`, see q13's plan), so this exists as the documented
  * UDAF extension point rather than a perf fix: the buffer is bounded at
  * k elements, so partial aggregation ships at most k rows per group per
  * map task — same network profile as WindowGroupLimit, usable where a
  * window is awkward (e.g. inside another aggregation).
  *
  * Ordering: score descending, id ascending tiebreak — deterministic.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def bound(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = bound(b :+ a)
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = bound(b1 ++ b2)
  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  def apply(k: Int): TopKAggregator = new TopKAggregator(k)
}
