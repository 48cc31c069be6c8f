package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection size of two SORTED distinct array<long> columns via a
  * codegen'd merge scan — no per-pair hash sets, no boxing.
  *
  * This is the hot loop of the pairwise-Jaccard queries: at sf0.1 the
  * blocked self-join evaluates ~2.5M pairs; `array_intersect` on string
  * arrays builds a hash set per pair (~18 µs measured), while this
  * merge costs ~an L1-resident linear scan. Jaccard follows as
  * inter / (|A| + |B| - inter). Inputs MUST be sorted ascending and
  * distinct (e.g. `array_sort(transform(array_distinct(x), xxhash64))`)
  * — token→hash mapping is injective on any realistic vocabulary, so
  * counts equal the string-set counts the oracle computes.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  // locals via freshName — see DotProduct: fixed names collide when two
  // expressions share one codegen scope
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(n, m, i, j, c, xi, yj) =
        Seq("n", "m", "i", "j", "c", "xi", "yj").map(ctx.freshName)
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature of an array<long> of element hashes: one tight
  * loop instead of k×|set| interpreted lambda dispatches (the
  * higher-order-function formulation measured ~10 s at sf0.1; this is
  * milliseconds). Same arithmetic as `MinHashAggregator`:
  * sig[i] = min over h of (a_i*h + b_i) mod p. CodegenFallback —
  * evaluated once per document, not per pair.
  */
case class MinHashSig(child: Expression, permA: Seq[Long], permB: Seq[Long],
                      prime: Long)
    extends UnaryExpression with CodegenFallback {

  private val k = permA.length
  require(permB.length == k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = (permA(i) * h + permB(i)) % prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted-distinct n-gram hashes of an array<string> token column in
  * ONE pass — shingle bytes hashed with a space separator (matching
  * the "t1 t2 t3" join semantics), then in-place sort + unique.
  * Replaces the interpreted
  * `array_sort(array_distinct(transform(ngrams(toks), hash)))` chain,
  * which paid per-element lambda dispatch and a string allocation per
  * n-gram — measured ~750 µs/doc at sf0.1 (3.8 s per materialization,
  * the dominant cost of q_dedup_near).
  *
  * Three hash modes, chosen by what downstream needs from the VALUES:
  *
  *   - `prime > 0` (the MinHash pipeline): the low 64 bits of MD5
  *     (little-endian u64 of digest bytes 8..15 — bit-for-bit DuckDB's
  *     `md5_number_lower`, the q_dedup_simhash r12 precedent) reduced
  *     by the UNSIGNED remainder mod `prime` — exactly
  *     `md5_number_lower(s) % prime` in DuckDB UBIGINT arithmetic, so
  *     the whole signature→banding→verify pipeline is ORACLE-CHECKABLE
  *     in SQL instead of golden-exempt. ~60 µs/doc (one MD5 per
  *     shingle), paid once per document materialization, not per pair.
  *     The 2^31-1 MinHash universe is FINE there because the oracle
  *     applies the identical mod — collisions change both sides alike.
  *   - `prime == 0` (span identity): the RAW md5 low64 — for consumers
  *     where a hash EQUALITY asserts two spans are the SAME STRING
  *     (q_span_depth). These must not ride the MinHash mod: at sf1's
  *     ~10^8 spans the 31-bit universe birthday-collides thousands of
  *     times (the r13 regression that motivated this mode: 4 223
  *     spurious cross-doc span flags vs the string-space oracle);
  *     the full 64-bit space puts an expected collision count ~1e-3.
  *   - `prime < 0` (the exact-Jaccard path): FNV-1a 64 over the full
  *     64-bit range. Only set SIZES and intersection COUNTS matter
  *     there — any deterministic injective token→hash map preserves
  *     them, which is what backs the DuckDB string-set oracle parity —
  *     so the cheaper non-cryptographic loop stays.
  *
  * CodegenFallback — evaluated once per document, not per pair.
  */
case class ShingleHashes(child: Expression, n: Int, prime: Long)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val md = if (prime >= 0) java.security.MessageDigest.getInstance("MD5") else null
    val sp = Array(' '.toByte)
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      if (prime >= 0) {
        var j = 0
        while (j < n) {
          if (j > 0) md.update(sp)
          md.update(toks(i + j))
          j += 1
        }
        val dig = md.digest() // digest() resets for the next shingle
        var h = 0L
        var k = 0
        while (k < 8) { h |= (dig(8 + k) & 0xffL) << (8 * k); k += 1 }
        // prime == 0: the RAW md5 low64 (full 64-bit space). The mod
        // reduction exists for the MinHash universe (2^31-1) where the
        // ORACLE mirrors it; a consumer that needs collision-free
        // VALUES (span identity) must not pay the 31-bit birthday
        // bound — at sf1's ~10^8 spans, mod 2^31-1 collided ~4k times
        // (the r13 span-depth regression this mode fixes).
        hs(i) = if (prime == 0) h else java.lang.Long.remainderUnsigned(h, prime)
      } else {
        var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
        var j = 0
        while (j < n) {
          if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
          val b = toks(i + j)
          var k = 0
          while (k < b.length) { h ^= (b(k) & 0xffL); h *= 0x100000001b3L; k += 1 }
          j += 1
        }
        hs(i) = h
      }
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < m) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SetFunctions {

  def register(spark: SparkSession,
               permA: Seq[Long], permB: Seq[Long], prime: Long): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig",
      exprs => MinHashSig(exprs.head, permA, permB, prime), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_shingle_hashes",
      exprs => {
        def intLit(e: Expression): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingle_hashes expects literal int args, got $other")
        }
        ShingleHashes(exprs(0), intLit(exprs(1)).toInt, intLit(exprs(2)))
      },
      "built-in")
  }

  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_size", a, b)

  def minhashSig(sh: Column): Column = call_function("graft_minhash_sig", sh)

  /** Sorted-distinct n-gram hashes (see [[ShingleHashes]]). */
  def shingleHashes(toks: Column, n: Int, prime: Long): Column =
    call_function("graft_shingle_hashes", toks, lit(n), lit(prime))
}
