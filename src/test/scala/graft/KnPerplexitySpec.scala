package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Kneser–Ney bigram LM: the normalization invariant (Σ_w2 P(w2|w1)
  * over the FULL vocabulary = 1 for every context), discount-mass
  * accounting, and the quality-signal ordering on hand-built docs. */
class KnPerplexitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 0.75

  private def toks(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))

  test("KN probabilities normalize: sum over the full vocab is 1 per context") {
    val d = toks(
      1L -> "a b a c a b",
      2L -> "b c b a c c")
    val (_, bc, lc, cc, tt) = TextAnalysis.knCounts(d)
    val c12 = bc.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val left = lc.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val contd = cc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = tt.collect().head.getLong(0).toDouble
    val vocab = contd.keySet // every continuable word
    for ((w1, (c1, n1fwd)) <- left) {
      val total = vocab.toSeq.map { w2 =>
        val c = c12.getOrElse((w1, w2), 0L).toDouble
        math.max(c - D, 0.0) / c1 + D * n1fwd / c1 * (contd(w2) / t)
      }.sum
      assert(math.abs(total - 1.0) < 1e-12, s"context $w1 sums to $total")
    }
  }

  test("per-doc KN perplexity: repetitive doc scores lower than mixed doc") {
    val d = toks(
      1L -> "a b a b a b a b a b a b",   // one dominant bigram pattern
      2L -> "a c b d c a d b e a c e")   // spread across many bigrams
    val out = TextAnalysis.perplexityKn(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < out(2L), s"repetitive should be more predictable: $out")
  }

  test("docs shorter than 2 tokens are absent; bigram counts are exact") {
    val d = toks(1L -> "solo", 2L -> "x y x")
    val out = TextAnalysis.perplexityKn(d).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(out.head.getLong(1) === 2L) // "x y", "y x"
  }
}
