package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Profile, Text}

/** Hand-computed fixtures for the r10 curation-diagnostics batch:
  * n-gram novelty, the exact two-sample KS drift statistic, and the
  * greedy token-budget selection. */
class NoveltyDriftBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toksDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "split(text, ' ') AS toks")

  test("ngramNovelty: introducing doc scores 1, reuser scores the novel share") {
    // doc1 introduces {a b, b c}; doc2 reuses "a b", introduces "b d";
    // doc3 has no bigrams
    val r = Text.ngramNovelty(toksDf(1L -> "a b c", 2L -> "a b d", 3L -> "x"))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 2L, 1.0)))
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(r(3L) == ((0L, 0L, 0.0)))
  }

  test("ngramNovelty counts repeated in-doc bigrams once (distinct per doc)") {
    val r = Text.ngramNovelty(toksDf(1L -> "a b a b")).collect()(0)
    // bigrams a-b, b-a, a-b -> distinct {a b, b a}
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getDouble(3) == 1.0)
  }

  test("ksBySource: hand-computed D on a 2-source integer fixture") {
    // A = {1,1,2}, B = {2,3}: exact D(A vs rest) = 4/6 at v=1 (cum_A·2
    // minus cum_rest·3 over v = 1,2,3 gives |4|,|3|,|0|), symmetric for B
    val df = Seq(("A", 1), ("A", 1), ("A", 2), ("B", 2), ("B", 3))
      .toDF("source", "n_toks")
    val r = Profile.ksBySource(df).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getInt(3), x.getDouble(4)))).toMap
    assert(r("A") == ((3L, 2L, 1, 0.666667)))
    assert(r("B") == ((2L, 3L, 1, 0.666667)))
  }

  test("ksBySource: identical distributions report D = 0 at the smallest value") {
    val df = Seq(("A", 5), ("A", 7), ("B", 5), ("B", 7)).toDF("source", "n_toks")
    val r = Profile.ksBySource(df).collect()
    assert(r.forall(_.getDouble(4) == 0.0))
    assert(r.forall(_.getInt(3) == 5))
  }

  test("ksBySource: single-source corpus reports 0, not a division by zero") {
    val r = Profile.ksBySource(Seq(("A", 1), ("A", 2)).toDF("source", "n_toks"))
      .collect()
    assert(r.length == 1 && r(0).getLong(2) == 0L && r(0).getDouble(4) == 0.0)
  }

  test("tokenBudget: inclusive prefix rule, quality order, doc_id tiebreak") {
    val q = Seq((1L, 10, 0.9), (2L, 5, 0.8), (3L, 4, 0.8),
                (4L, 100, 0.95), (5L, 3, 0.5))
      .toDF("doc_id", "n_toks", "quality")
    // order: d4(.95) d1(.9) d2(.8,id2) d3(.8,id3) d5(.5);
    // cums 100,110,115,119,122 -> budget 119 keeps the first four
    val r = Curation.tokenBudget(q, budget = 119L).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r == Map(4L -> 100L, 1L -> 110L, 2L -> 115L, 3L -> 119L))
  }

  test("tokenBudget: a first doc over budget blocks the whole prefix") {
    val q = Seq((1L, 100, 0.99), (2L, 1, 0.5)).toDF("doc_id", "n_toks", "quality")
    // prefix semantics, not knapsack: d1's cum 100 > 20 and the cumsum
    // is monotone, so NOTHING is kept — d2 is not pulled forward
    assert(Curation.tokenBudget(q, budget = 20L).count() == 0L)
  }

  test("tokenBudget banded prefix sum equals a naive global cumsum") {
    // 40 docs spread across quality bands incl. exact band boundaries
    val q = (1L to 40L).map { i =>
      (i, (i % 7 + 1).toInt, math.rint((i % 10) * 10.0) / 100.0) }
      .toDF("doc_id", "n_toks", "quality")
    val got = Curation.tokenBudget(q, budget = 60L).collect()
      .map(x => (x.getLong(0), x.getLong(3))).toSet
    val naive = q.collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2)))
      .sortBy { case (id, _, qu) => (-qu, id) }
      .scanLeft((0L, 0, 0.0, 0L)) { case ((_, _, _, cum), (id, n, qu)) =>
        (id, n, qu, cum + n) }.drop(1)
      .filter(_._4 <= 60L).map(x => (x._1, x._4)).toSet
    assert(got == naive)
  }
}
