package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * approximate frequent-items operator that complements the engine's
  * other sketches (HLL distinct counts, `percentile_approx`): find every
  * token whose frequency exceeds n/(k+1) using O(k) space per partial,
  * merging losslessly w.r.t. the guarantee.
  *
  * Guarantees (standard MG, and what the spec pins):
  *  - any item with true count > n/(k+1) IS in the output;
  *  - every reported count underestimates the true count by at most
  *    n/(k+1);
  *  - partials merge by counter addition + (k+1)-th-largest subtraction
  *    (Agarwal et al., "Mergeable Summaries"), so map-side combine ships
  *    k counters per task no matter how many rows it saw.
  *
  * Exact contents BELOW the threshold are partition-dependent (inherent
  * to MG) — consumers filter on `count >= n/(k+1)` for the deterministic
  * slice, or verify candidates with one exact count pass (the same
  * candidates-then-verify composition as the dedup family).
  */
class HeavyHitters(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      case None => // decrement-all, drop zeros — the classic MG miss step
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everyone, drop <= 0
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object HeavyHitters {
  def apply(k: Int): HeavyHitters = new HeavyHitters(k)
}
