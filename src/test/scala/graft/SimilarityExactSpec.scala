package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** The r12 certified-exact similarity contract: the two-phase default
  * (LSH-derived proven threshold τ + grid-blocked completion) must
  * return IDENTICAL results to the τ-free exhaustive twin on any
  * input — including the adversarial near-orthogonal case where the
  * LSH candidate stream is weakest (τ falls back to −2 for vectors
  * with < k candidates and the bound must still never cut a true
  * neighbour). Also pins [[Similarity.gridPairs]]'s structural
  * guarantee: every unordered pair exactly once, no self-pairs. */
class SimilarityExactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded near-orthogonal corpus — the hard case for any candidate
    * scheme (3rd-neighbour cosines ≈ 0.2-0.4, like the fixtures). */
  private def randomCorpus(n: Int, dim: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1L to n.toLong).map(i => (i, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("gridScoredPairs emits every unordered pair exactly once, no self-pairs") {
    val u = Similarity.normalizeEmbeddings(randomCorpus(97, 8, 11))
      .withColumn("tau", lit(-2.0)) // no pruning: the full pair stream
    for (blocks <- Seq(1, 4, 13)) {
      val pairs = Similarity.gridScoredPairs(u, blocks, 0.0)
        .select(least($"id_a", $"id_b").as("a"),
                greatest($"id_a", $"id_b").as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.length == 97 * 96 / 2, s"blocks=$blocks")
      assert(pairs.toSet.size == pairs.length, s"dup pair at blocks=$blocks")
      assert(pairs.forall { case (a, b) => a < b }, s"self pair at blocks=$blocks")
    }
  }

  test("gridScoredPairs τ filter keeps exactly the min(τa,τb)-margin survivors") {
    val u = Similarity.normalizeEmbeddings(randomCorpus(60, 8, 21))
    val all = Similarity.gridScoredPairs(
        u.withColumn("tau", lit(-2.0)), 4, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // per-row τ: even ids 0.2, odd ids 0.5
    val uTau = u.withColumn("tau",
      when(pmod($"vec_id", lit(2)) === 0, lit(0.2)).otherwise(lit(0.5)))
    val filt = Similarity.gridScoredPairs(uTau, 4, 1e-6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def tau(id: Long) = if (id % 2 == 0) 0.2 else 0.5
    val expected = all.filter { case ((a, b), s) =>
      s >= math.min(tau(a), tau(b)) - 1e-6 }
    assert(filt == expected)
    assert(filt.values.forall(s => all.values.exists(_ == s))) // same dots
  }

  test("knn default ≡ knnExhaustive on an adversarial random corpus") {
    val emb = randomCorpus(180, 24, 7)
    val d = Similarity.knn(emb, k = 4).collect().map(_.toSeq).toSeq
    val e = Similarity.knnExhaustive(emb, k = 4).collect().map(_.toSeq).toSeq
    assert(d == e)
    assert(d.length == 180 * 4)
  }

  test("cosineTopK default ≡ cosineTopKExhaustive on an adversarial random corpus") {
    val emb = randomCorpus(150, 24, 13)
    val d = Similarity.cosineTopK(emb, n = 60).collect().map(_.toSeq).toSeq
    val e = Similarity.cosineTopKExhaustive(emb, n = 60).collect().map(_.toSeq).toSeq
    assert(d == e)
    assert(d.length == 60)
  }

  test("candidate-starved corpus (fewer candidates than n): τ = −2 fallback stays exact") {
    // 6 vectors: the light index can't produce 100 candidate pairs, so
    // the τ aggregate must emit the no-pruning sentinel, not a bogus
    // bound from an underfull candidate set
    val emb = randomCorpus(6, 8, 3)
    val d = Similarity.cosineTopK(emb, n = 100).collect().map(_.toSeq).toSeq
    val e = Similarity.cosineTopKExhaustive(emb, n = 100).collect().map(_.toSeq).toSeq
    assert(d == e)
    assert(d.length == 6 * 5 / 2) // all pairs qualify when n > pair count
  }

  test("empty corpus: defaults return empty frames with the contract schema") {
    val emb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.knn(emb, k = 3).columns.toSeq ==
      Seq("id_a", "rn", "id_b", "cos_sim"))
    assert(Similarity.knn(emb, k = 3).count() == 0)
    assert(Similarity.cosineTopK(emb).count() == 0)
    assert(Similarity.embeddingNearDups(emb).count() == 0)
  }

  test("embeddingNearDups finds planted near-dups through the grid join") {
    val rng = new scala.util.Random(5)
    val base = Array.fill(16)(rng.nextGaussian().toFloat)
    val emb = (
      Seq((1L, base), (2L, base.map(x => x * 1.001f + 0.0005f))) ++
        (3L to 40L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    ).toDF("vec_id", "embedding")
    val hits = Similarity.embeddingNearDups(emb, minCos = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.contains((1L, 2L)))
  }
}
