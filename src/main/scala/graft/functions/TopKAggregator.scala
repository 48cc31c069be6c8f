package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs, ordered by
  * (score desc, id asc) — exactly the `row_number() over (order by
  * score desc, id asc) <= k` cut, without the window's full sort.
  *
  * The buffer never exceeds k elements, so partial aggregation
  * (map-side combine) ships at most k rows per group per map partition
  * instead of the whole pair space through one sort — the difference
  * between shuffling 4M scored pairs and shuffling ~k×groups rows in
  * the kNN queries.
  *
  * `reduce` is the per-input-row hot path (millions of calls in a pair
  * join): it is a bounded insertion — O(1) reject against the current
  * worst (the overwhelmingly common case once the buffer is warm, and
  * it returns the SAME buffer object, so no allocation at all), O(k)
  * insert otherwise. The sort-merge only runs in `merge`, which fires
  * once per (group, map partition), not per row.
  *
  * With `distinct = true` a (score, id) pair already in the buffer is
  * skipped (an O(k) scan of the tiny buffer). This lets a caller whose
  * input stream may contain duplicate pairs — e.g. a multi-table LSH
  * candidate join where the same neighbour collides in several hash
  * tables — skip an entire pre-aggregation `dropDuplicates` shuffle of
  * the candidate stream: the dedup happens inside the bounded buffer
  * for free.
  */
class TopKAggregator(k: Int, distinct: Boolean = false)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  require(k >= 1)

  // (score desc, id asc)
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty

  /** Bounded insertion keeping the buffer sorted by [[lt]]. */
  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && !lt(x, buf.last)) buf // common case: not top-k, no alloc
    else if (distinct && buf.contains(x)) buf    // duplicate pair, already held
    else {
      val (better, worse) = buf.span(lt(_, x))
      val inserted = (better :+ x) ++ worse
      if (inserted.length > k) inserted.take(k) else inserted
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val all = if (distinct) (a ++ b).distinct else a ++ b
    all.sortWith(lt).take(k)
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
