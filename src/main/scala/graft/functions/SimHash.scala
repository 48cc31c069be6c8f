package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of an array<string> token column.
  *
  * Classic Charikar simhash: each token hashes to 64 bits (two seeded
  * murmur3-32 halves); bit b of the result is set iff the sum over
  * tokens of (+1 if token-bit b else -1) is positive. Token
  * multiplicity acts as natural weighting. Near-duplicate documents
  * differ in few bits, so Hamming-distance banding finds candidates
  * without a quadratic pair scan.
  *
  * CodegenFallback: evaluated once per document (O(tokens) work each) —
  * not a per-pair hot path, so interpreted eval costs nothing
  * measurable and keeps the implementation obvious.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val str = if (s == null) "" else s.toString
      val h1 = MurmurHash3.stringHash(str, 0xcafebabe)
      val h2 = MurmurHash3.stringHash(str, 0x9747b28c)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
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
