package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash of an array<string> token column.
  *
  * Classic Charikar simhash: each token hashes to 64 bits; bit b of
  * the result is set iff the sum over tokens of (+1 if token-bit b
  * else -1) is positive. Token multiplicity acts as natural weighting.
  * Near-duplicate documents differ in few bits, so Hamming-distance
  * banding finds candidates without a quadratic pair scan.
  *
  * The per-token hash is the LOW 64 bits of MD5 (little-endian u64 of
  * digest bytes 8..15) — r12, replacing the r2-r11 Scala murmur3:
  * MD5 is a published, engine-independent function that DuckDB exposes
  * as `md5_number_lower`, so the whole simhash (and the banded
  * candidate join on top of it) is ORACLE-CHECKABLE in SQL instead of
  * golden-exempt. Hash quality is equivalent for banding purposes
  * (both are uniform 64-bit hashes); MD5's cryptographic weaknesses
  * are irrelevant here.
  *
  * CodegenFallback: evaluated once per document (O(tokens) work each) —
  * not a per-pair hot path, so interpreted eval costs nothing
  * measurable and keeps the implementation obvious.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val dig = md.digest(
        if (s == null) Array.emptyByteArray else s.getBytes)
      // little-endian u64 of digest bytes 8..15 — DuckDB's
      // md5_number_lower, bit-for-bit
      var h = 0L
      var j = 0
      while (j < 8) { h |= (dig(8 + j) & 0xffL) << (8 * j); j += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFunctions {

  /** Registers `graft_simhash64` (idempotent per session). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "built-in")

  def simhash64(tokens: Column): Column = call_function("graft_simhash64", tokens)
}
