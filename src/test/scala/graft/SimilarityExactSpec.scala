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

  test("semanticMatches grid ≡ broadcast twin (r13: the no-corpus-broadcast binding)") {
    // the bipartite grid must reproduce the brute-force broadcast plan
    // bit-for-bit — same normalize, same ascending dot, same rounded
    // filter — across block counts (97 corpus rows exercise 1, partial
    // and many-block grids via gridBlocks' 256-row sizing)
    val corpus = randomCorpus(97, 16, 31)
    val probes = randomCorpus(9, 16, 32)
      .withColumn("vec_id", col("vec_id") + 1000L)
    for (minCos <- Seq(0.1, 0.3)) {
      val g = Similarity.semanticMatches(corpus, probes, minCos)
        .collect().map(_.toSeq).toSeq
      val b = Similarity.semanticMatchesBroadcast(corpus, probes, minCos)
        .collect().map(_.toSeq).toSeq
      assert(g == b, s"minCos=$minCos")
      assert(g.nonEmpty, s"vacuous at minCos=$minCos — lower the threshold")
    }
  }

  test("semanticMatches: overlapping ids never self-match (grid ≡ broadcast on the exclusion)") {
    // probe ids that ALSO appear in the corpus are excluded pairwise
    // (vec_id != probe_id), not dropped from the corpus — both plans
    // must agree on that contract
    val corpus = randomCorpus(60, 8, 41)
    val probes = corpus.filter(col("vec_id") % 10 === 0)
    val g = Similarity.semanticMatches(corpus, probes, 0.2)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.semanticMatchesBroadcast(corpus, probes, 0.2)
      .collect().map(_.toSeq).toSeq
    assert(g == b)
  }

  test("semanticMatchesAnn: posting-index probe is a sound under-approximation with high recall") {
    // the ANN fast path may MISS pairs (recall < 1) but must never
    // invent one: every reported hit row is dominated by the exact
    // row (hits ≤, max_cos ≤), and fixture recall clears the measured
    // OR-amplified floor
    val spark2 = spark
    val dir = TestSpark.sf0001
    val pred = col("vec_id") % 50 === 0
    val e = graft.Tables.embeddings(spark2, dir)
    val exact = Similarity.semanticMatches(
        e.filter(col("vec_id") % 50 =!= 0), e.filter(pred), 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ann = Similarity.semanticMatchesAnn(spark2, dir, pred, 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(exact.nonEmpty, "vacuous fixture — lower the threshold")
    ann.foreach { case (id, (n, mx)) =>
      val (en, emx) = exact.getOrElse(id,
        fail(s"ann invented contaminated vec $id"))
      assert(n <= en && mx <= emx, s"ann overclaims vec $id")
    }
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${ann.size}/${exact.size})")
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
