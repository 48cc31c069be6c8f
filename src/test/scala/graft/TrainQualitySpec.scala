package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** The in-engine quality-classifier trainer (r14): planted separable
  * fixture recovered, bitwise determinism, and partition-order
  * independence of the quantized gradient sums. The oracle row
  * (q_train_quality) verifies every gradient/weight update against
  * DuckDB; these goldens pin the LEARNING behavior itself. */
class TrainQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 50 high-quality docs (long, diverse, stopword-free → label 1)
    * and 50 low-quality ones (short, repetitive, all-stopword →
    * label 0) — linearly separable in the trainer's feature space. */
  private def planted = (0 until 50).map(i =>
      (i.toLong, 100, 100, 0)) ++ (50 until 100).map(i =>
      (i.toLong, 10, 1, 10))

  private def plantedDf =
    planted.toDF("doc_id", "n_toks", "n_distinct", "n_stop")

  test("planted separable fixture: 5 fixed iterations separate the classes at the 0.5 cut") {
    val stats = plantedDf
    val w = TextAnalysis.trainQualityWeights(stats)
    assert(w.exists(_ != 0.0), "weights never moved")
    val scored = TextAnalysis.scoreQuality(stats, w).collect()
    scored.foreach { r =>
      val (id, label, score, keep) =
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3))
      assert(label == (if (id < 50) 1 else 0), s"doc $id label")
      assert(keep == (label == 1), s"doc $id not separated: score=$score")
    }
    // margin actually opened: class means on opposite sides of 0.5
    val hi = scored.filter(_.getInt(1) == 1).map(_.getDouble(2))
    val lo = scored.filter(_.getInt(1) == 0).map(_.getDouble(2))
    assert(hi.min > 0.5 && lo.max < 0.5,
      s"no margin: hi.min=${hi.min} lo.max=${lo.max}")
  }

  test("training is bitwise deterministic and partition-order independent") {
    val w1 = TextAnalysis.trainQualityWeights(plantedDf)
    val w2 = TextAnalysis.trainQualityWeights(plantedDf)
    assert(w1.toSeq == w2.toSeq, "two runs differ")
    // the quantized-gradient discipline: a different partitioning
    // (different fold order) must yield the SAME bits
    val w3 = TextAnalysis.trainQualityWeights(plantedDf.repartition(7))
    assert(w1.toSeq == w3.toSeq, "partition order moved a bit")
    // and more iterations keep improving the planted margin, not
    // oscillating: margin(10 iters) >= margin(5 iters)
    def margin(w: Array[Double]) = {
      val s = TextAnalysis.scoreQuality(plantedDf, w).collect()
      s.filter(_.getInt(1) == 1).map(_.getDouble(2)).min -
        s.filter(_.getInt(1) == 0).map(_.getDouble(2)).max
    }
    val w10 = TextAnalysis.trainQualityWeights(plantedDf, iters = 10)
    assert(margin(w10) >= margin(w1) - 1e-9,
      "longer training shrank the planted margin")
  }

  test("imbalanced fixture: bias learns the prior (all-negative corpus scores below 0.5)") {
    // every doc low-quality: the trainer must push ALL scores down,
    // exercising the bias term (w1) specifically
    val allLow = (0 until 80).map(i => (i.toLong, 10, 1, 10))
      .toDF("doc_id", "n_toks", "n_distinct", "n_stop")
    val w = TextAnalysis.trainQualityWeights(allLow)
    val scored = TextAnalysis.scoreQuality(allLow, w).collect()
    assert(scored.forall(r => !r.getBoolean(3)),
      "negative-only corpus still keeps docs")
    assert(w(0) < 0.0, s"bias never went negative: ${w.toSeq}")
  }
}
