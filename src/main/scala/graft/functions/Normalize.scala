package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-
  * composition pass every text pipeline runs before tokenizing,
  * hashing, or deduplicating: a decomposed "e" + COMBINING ACUTE and
  * the precomposed "é" are the SAME text and must hash identically,
  * or near-dup/exact-dup both silently miss cross-source duplicates
  * whose only difference is the upstream editor's normalization form.
  *
  * Spark has no built-in for this (`lower`/`regexp_replace` are
  * form-preserving), so it is the textbook case for a native
  * `Expression`: one JDK call (`java.text.Normalizer` — the same
  * Unicode 15 NFC tables DuckDB's utf8proc implements, which is what
  * makes the DuckDB `nfc_normalize` oracle a fair cross-check), with
  * real `doGenCode` so the hot path stays inside whole-stage codegen
  * — an ASCII fast path (`Normalizer.isNormalized` is O(n) with no
  * allocation for already-NFC text, the overwhelmingly common case)
  * and zero UTF8String→String round-trip when already normalized.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object NormalizeFunctions {

  /** Registers `graft_nfc` (idempotent per session). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")

  def nfc(text: Column): Column = call_function("graft_nfc", text)
}
