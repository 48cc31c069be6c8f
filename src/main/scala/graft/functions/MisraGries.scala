package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed, MERGEABLE Spark
  * aggregator: `k` counters summarize a token stream so that
  *
  *  - every item with true frequency f > N/(k+1) is GUARANTEED to be
  *    in the summary (N = total stream length), and
  *  - each surviving counter undercounts its item's true frequency by
  *    at most N/(k+1).
  *
  * The classic streaming algorithm (Misra & Gries 1982) with the
  * merge rule from "Mergeable Summaries" (Agarwal, Cormode, Huang,
  * Phillips, Wei, Yi — PODS'12): add counters pointwise, then if more
  * than `k` survive, subtract the (k+1)-th largest count from all and
  * drop the non-positive. The PODS'12 result is that this preserves
  * the N/(k+1) error bound under arbitrary merge trees — exactly
  * Spark's partial-aggregation contract (per-partition reduce, then
  * arbitrary-order merge), so the guarantee holds distributed with a
  * fixed O(k) state per partition and one O(k)-sized row through the
  * final shuffle. No exact global token count ever materializes.
  *
  * The engine pairs this with a second exact pass over just the ≤ k
  * candidates ([[graft.ops.TextAnalysis.heavyHitters]]): sketch →
  * candidate set ⊇ true heavy hitters → broadcast recount → exact,
  * provably complete answer. That two-pass shape is why the output is
  * oracle-checkable even though the sketch itself is approximate.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  require(k >= 1, s"MisraGries: need k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  /** Streaming step: increment a held counter, claim a free slot, or
    * decrement everything (the step that "charges" one occurrence of
    * each held item against the new item — at most N/(k+1) total
    * decrements can ever hit one item). */
  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] = {
    val t = if (tok == null) "" else tok
    buf.get(t) match {
      case Some(c) => buf.updated(t, c + 1)
      case None if buf.size < k => buf.updated(t, 1L)
      case None =>
        // decrement-all, dropping zeros; the arriving item is consumed
        // by the same decrement (its counter would be 1 - 1 = 0)
        buf.flatMap { case (s, c) => if (c > 1) Some(s -> (c - 1)) else None }
    }
  }

  /** PODS'12 merge: pointwise sum, then one subtraction of the
    * (k+1)-th largest count restores the size bound. */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (s, c)) =>
      m.updated(s, m.getOrElse(s, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val kth = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (s, c) => if (c > kth) Some(s -> (c - kth)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
