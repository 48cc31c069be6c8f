package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Analytics

/** Exact tie-corrected ROC AUC on hand-computed fixtures. */
class AucSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Double, Boolean)]) =
    Analytics.auc(rows.toDF("score", "label")).collect()(0)

  test("auc: hand-computed 2x2 with one tied pair") {
    // pos {0.9, 0.7}, neg {0.7, 0.5}: pairs >,>,tie,> -> 3.5/4
    val r = run(Seq(0.9 -> true, 0.7 -> true, 0.7 -> false, 0.5 -> false))
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.875)
  }

  test("auc: perfect separation is 1, inverted is 0") {
    assert(run(Seq(0.9 -> true, 0.8 -> true, 0.2 -> false)).getDouble(2) == 1.0)
    assert(run(Seq(0.1 -> true, 0.9 -> false)).getDouble(2) == 0.0)
  }

  test("auc: single-class input reports the uninformative 0.5") {
    assert(run(Seq(0.4 -> true, 0.6 -> true)).getDouble(2) == 0.5)
  }

  test("auc on an arbitrary score domain (logits) matches the naive statistic") {
    // r10 advice: banding must stay bounded AND correct outside [0,1]
    val rows = (1 to 40).map(i => (((i * 7) % 19).toDouble * 3.5 - 30.0, i % 4 == 0))
    val got = run(rows).getDouble(2)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    assert(got == math.rint(num / (pos.size * neg.size) * 1e6) / 1e6)
  }

  test("auc banded prefix sum equals the naive pairwise statistic") {
    val rows = (1 to 60).map(i => ((i % 13).toDouble / 13.0, i % 3 == 0))
    val got = run(rows).getDouble(2)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val num = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val naive = math.rint(num / (pos.size * neg.size) * 1e6) / 1e6
    assert(got == naive)
  }
}
