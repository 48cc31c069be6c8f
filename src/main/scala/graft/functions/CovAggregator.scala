package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Exact-covariance accumulation buffer: radix-split integer sums of
  * first moments (xa·2^34 + xc = Σx·2^50 per dim) and upper-triangle
  * second moments (pa·2^68 + pb·2^34 + pc = Σxy·2^100 per (i,j) pair),
  * plus the row count. All chunks are longs. Per ROW |pa| ≤ 2^32 and
  * pb/pc/xc < 2^34, so the low chunks stay inside a long to ~2^29
  * rows per PARTITION; [[CovAggregator.merge]] carry-normalizes the
  * low chunks back under 2^34 on every combine (the reassembly
  * pa·2^68 + pb·2^34 + pc is linear, so moving carry between chunks
  * preserves it exactly), leaving only the TOP chunks (pa, xa) to
  * grow corpus-wide — |pa| ≈ rows·|x·y|·2^32, a long to ~2·10^9
  * unit-scale rows. Every addition is Math.addExact (r11 advice: a
  * plain += past the bound silently wraps into a WRONG covariance;
  * addExact throws, and the caller shards or widens). Every per-row
  * operation stays a handful of double/long instructions (no
  * BigDecimal in the hot loop; the exact wide integers are
  * reassembled once, from the 6 368 final longs). */
case class CovBuf(xa: Array[Long], xc: Array[Long],
                  pa: Array[Long], pb: Array[Long], pc: Array[Long],
                  n: Long)

/** One-pass distributed covariance accumulator over d-dim vectors —
  * the [[graft.ops.Similarity.covMatrix]] engine. The first
  * implementation generated the d(d+1)/2 products as a per-row nested
  * higher-order-function struct array and summed DECIMAL(38,0): the
  * interpreted lambda dispatch and per-row BigDecimal allocation
  * measured ~200 s at 416M products where this tight JVM loop is
  * seconds. Exactness is identical: float32 products are exact in
  * double (≤ 48 significant bits), ×2^100 they are exact integers,
  * and the radix split/reassembly is pure integer arithmetic.
  *
  * Input vectors must satisfy x·2^50 ∈ ℤ (the corpus contract shared
  * with centroidDrift); violations throw rather than silently losing
  * bits. */
class CovAggregator(d: Int) extends Aggregator[Seq[Double], CovBuf, CovBuf] {
  private val S   = 1125899906842624.0           // 2^50
  private val P   = S * S                        // 2^100
  private val C34 = 17179869184.0                // 2^34
  private val C68 = C34 * C34                    // 2^68
  private val nPairs = d * (d + 1) / 2

  override def zero: CovBuf =
    CovBuf(new Array[Long](d), new Array[Long](d),
           new Array[Long](nPairs), new Array[Long](nPairs),
           new Array[Long](nPairs), 0L)

  override def reduce(b: CovBuf, v: Seq[Double]): CovBuf = {
    require(v.length == d, s"CovAggregator: expected $d dims, got ${v.length}")
    val x = v.toArray
    var i = 0
    while (i < d) {
      val xs = x(i) * S
      if (math.floor(xs) != xs)
        throw new IllegalArgumentException(
          s"covMatrix: value has >50 fraction bits: ${x(i)}")
      // the PRODUCT-exactness proof needs ≤24-bit (float32) mantissas
      // (48-bit products are exact in double); x·2^50 ∈ ℤ alone does
      // not bound the mantissa, and the radix-split reconstruction
      // check verifies the ALREADY-ROUNDED product against itself —
      // so a wide-mantissa double input must be rejected here, not
      // silently summed inexactly (r11 review)
      if (x(i).toFloat.toDouble != x(i))
        throw new IllegalArgumentException(
          s"covMatrix: value is not float32-exact (>24-bit mantissa): ${x(i)}")
      val a = math.floor(xs / C34)
      b.xa(i) = Math.addExact(b.xa(i), a.toLong)
      b.xc(i) = Math.addExact(b.xc(i), (xs - a * C34).toLong)
      i += 1
    }
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val p = x(i) * x(j) * P
        val a = math.floor(p / C68)
        val r = p - a * C68
        val q = math.floor(r / C34)
        val c = r - q * C34
        if (a * C68 + q * C34 + c != p)
          throw new IllegalArgumentException(
            s"covMatrix: product has >100 fraction bits: $p")
        b.pa(k) = Math.addExact(b.pa(k), a.toLong)
        b.pb(k) = Math.addExact(b.pb(k), q.toLong)
        b.pc(k) = Math.addExact(b.pc(k), c.toLong)
        k += 1; j += 1
      }
      i += 1
    }
    b.copy(n = b.n + 1)
  }

  /** Combine with carry renormalization: low chunks are brought back
    * under 2^34 (floorDiv keeps them non-negative for signed inputs),
    * so repeated merges never grow them — only the top chunks (xa,
    * pa) accumulate corpus-wide, and those additions are overflow-
    * checked. Renormalization is sound because the reassembly is the
    * LINEAR form pa·2^68 + pb·2^34 + pc (resp. xa·2^34 + xc): moving
    * floorDiv carry up a chunk preserves the sum bit-for-bit. */
  override def merge(a: CovBuf, b: CovBuf): CovBuf = {
    val C = 17179869184L // 2^34
    var i = 0
    while (i < d) {
      val xc = Math.addExact(a.xc(i), b.xc(i))
      val cx = Math.floorDiv(xc, C)
      a.xc(i) = xc - cx * C
      a.xa(i) = Math.addExact(Math.addExact(a.xa(i), b.xa(i)), cx)
      i += 1
    }
    var k = 0
    while (k < nPairs) {
      val pc = Math.addExact(a.pc(k), b.pc(k))
      val cc = Math.floorDiv(pc, C)
      a.pc(k) = pc - cc * C
      val pb = Math.addExact(Math.addExact(a.pb(k), b.pb(k)), cc)
      val cb = Math.floorDiv(pb, C)
      a.pb(k) = pb - cb * C
      a.pa(k) = Math.addExact(Math.addExact(a.pa(k), b.pa(k)), cb)
      k += 1
    }
    a.copy(n = a.n + b.n)
  }

  override def finish(reduction: CovBuf): CovBuf = reduction

  override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
}
