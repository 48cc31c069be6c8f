package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 1-based positions where `phrase` occurs as consecutive elements of
  * a token array — one tight per-row loop of UTF8String equality
  * checks.
  *
  * Replaces the `filter(sequence(1, n), i -> ...)` higher-order-
  * function formulation in [[graft.ops.Search.phraseSearch]]: Spark
  * evaluates HOF lambdas per element through the INTERPRETED
  * expression path (measured ~9 µs/position → 30 s for the sf1 corpus
  * scan), while this expression is one doc-at-a-time scan
  * (CodegenFallback — the [[MinHashSig]] rationale: per-document
  * cost, not per-pair, so interpreted dispatch of the WHOLE
  * expression once per row is already negligible). Overlapping
  * occurrences count individually (positions advance by 1). */
case class PhrasePositions(child: Expression, phrase: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(phrase.nonEmpty, "phrase must have at least one token")

  private val p: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = p.length
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val t = toks.getUTF8String(i + j)
        if (t == null || !t.equals(p(j))) ok = false
        j += 1
      }
      if (ok) out += i + 1
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseFunctions {
  /** The ONE builder for `graft_phrase_positions`, shared with
    * [[GraftFunctions.builders]] (the r9 advisor flagged the two
    * registries carrying divergent copies). Phrase tokens must be
    * plan-time string constants; FOLDABLE non-Literal expressions
    * (e.g. `concat('big', ' data')`) are constant-folded here rather
    * than rejected. */
  private[functions] val builder: Seq[Expression] => Expression = exprs => {
    val toks = exprs.tail.map { e =>
      val folded =
        if (e.foldable && e.dataType == StringType) Literal(e.eval(), StringType)
        else e
      folded match {
        case Literal(s: UTF8String, StringType) if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_phrase_positions expects constant string phrase tokens, got $other")
      }
    }
    PhrasePositions(exprs.head, toks)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_phrase_positions", builder, "built-in")

  /** Column API: positions of `phrase` in the token-array column. */
  def phrasePositions(toks: Column, phrase: Seq[String]): Column =
    call_function("graft_phrase_positions",
      toks +: phrase.map(org.apache.spark.sql.functions.lit): _*)
}
