package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the
  * record-linkage scorer that complements [[graft.ops.Fuzzy]]'s
  * edit-distance join: Levenshtein gates candidates by an integer
  * budget, Jaro–Winkler RANKS them (prefix-weighted, transposition-
  * tolerant — the name-matching standard since the Census studies).
  *
  * Definition (matching DuckDB's `jaro_winkler_similarity`, verified
  * value-for-value on the textbook pairs): matches within a
  * `max(|a|,|b|)/2 − 1` window, half-counted transpositions,
  * `jaro = (m/|a| + m/|b| + (m−t)/m) / 3`, Winkler boost
  * `jaro + ℓ·0.1·(1−jaro)` with common-prefix ℓ ≤ 4 applied only
  * above the 0.7 threshold, and 0.0 when either side is empty —
  * INCLUDING the both-empty edge, which this DuckDB build also scores
  * 0.0 (verified: `jaro_winkler_similarity('','') = 0.0` on the
  * oracle's DuckDB; some implementations, e.g. rapidfuzz, define
  * both-empty as 1.0 — the bit-identity claim is scoped to DuckDB's
  * convention, which the fixture's never-empty names exercise).
  *
  * Codegen: one static call per pair (the levenshtein pattern —
  * no boxing, no UDF serialization); O(|a|·|b|) worst case on two
  * boolean flag arrays.
  */
object JaroWinklerImpl {

  /** Jaro similarity on java Strings (code-unit granularity, same as
    * DuckDB's byte/char handling for the ASCII range). */
  def jaro(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / l1 + md / l2 + (md - t / 2) / md) / 3.0
  }

  /** Winkler boost above the 0.7 threshold, prefix capped at 4. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** `graft_jaro_winkler(a, b)` — see [[JaroWinklerImpl]]. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String],
                               b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerImpl.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarity {
  /** Column API for the Jaro–Winkler expression. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)
}
