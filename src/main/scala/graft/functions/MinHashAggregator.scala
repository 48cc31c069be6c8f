package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a MinHash signature from a stream of
  * shingle hashes (the UDAF extension point, SURVEY.md §2.2).
  *
  * Buffer = the running element-wise minimum of (a_i*h + b_i) mod p over
  * all shingles seen; merge = element-wise min — associative and
  * commutative, so partial aggregation (map-side combine) is safe and
  * the shuffle carries only k longs per group no matter how many
  * shingles a document has. This is the streaming/grouped counterpart
  * of the expression-based signature in `ops.Dedup` (tests assert they
  * agree).
  *
  * @param k     signature length
  * @param permA multiplier constants (length k)
  * @param permB addend constants (length k)
  * @param prime modulus
  */
class MinHashAggregator(k: Int, permA: Array[Long], permB: Array[Long], prime: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  require(permA.length == k && permB.length == k)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (permA(i) * h + permB(i)) % prime
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
