package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One registry of every graft SQL function, so the whole surface is
  * installable in one call — used both by ad-hoc session registration
  * (each ops module registers what it needs) and by
  * [[graft.plans.GraftExtensions]], which injects them into every
  * session built `.withExtensions(new GraftExtensions)`: a user gets
  * `SELECT graft_dot(a, b)` in plain SQL with no imports.
  *
  * MinHash permutation constants default to the engine's fixed-seed
  * set ([[graft.ops.Dedup.permA]]) — deterministic run to run.
  */
object GraftFunctions {

  private def intLit(e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"expected a literal int argument, got $other")
  }

  private def boolLit(e: Expression): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"expected a literal boolean argument, got $other")
  }

  /** name → builder for every graft function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" ->
      (e => DotProduct(e(0), e(1))),
    "graft_sorted_intersect_size" ->
      (e => SortedIntersectSize(e(0), e(1))),
    "graft_minhash_sig" ->
      (e => MinHashSig(e.head, graft.ops.Dedup.permA.toSeq,
                       graft.ops.Dedup.permB.toSeq,
                       graft.ops.Dedup.MersennePrime)),
    "graft_shingle_hashes" ->
      (e => ShingleHashes(e(0), intLit(e(1)).toInt, intLit(e(2)))),
    "graft_simhash64" ->
      (e => SimHash64(e.head)),
    "graft_topk" ->
      (e => TopKPairs(e(0), e(1), intLit(e(2)).toInt, boolLit(e(3)))),
    "graft_nfc" ->
      (e => NfcNormalize(e.head)),
    "graft_jaro_winkler" ->
      (e => JaroWinklerSim(e(0), e(1))),
    "graft_phrase_positions" -> PhraseFunctions.builder,
  )

  /** Registers every graft function on the session (idempotent). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}
