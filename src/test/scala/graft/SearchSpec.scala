package graft


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Relational, Search, Similarity}

/** Hand-computed semantics for the r8 retrieval/analytics batch:
  * positional phrase search, RRF hybrid fusion, the 2-D skyline
  * sweep (vs the brute-force dominance definition), and the
  * exact-carrier centroid drift. */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))

  // ---------------------------------------------------------------
  // phraseSearch
  // ---------------------------------------------------------------

  test("phrase search: start/end/overlap/absent/short-doc cases") {
    val d = toks(
      1L -> "a b c x a b",   // phrase at start
      2L -> "x y a b c",     // phrase at end
      3L -> "a b c a b c",   // two non-overlapping occurrences
      4L -> "a a a a",       // overlapping occurrences of (a a a)
      5L -> "a c b",         // tokens present, order wrong
      6L -> "a b")           // shorter than the phrase
    val abc = Search.phraseSearch(d, Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    assert(abc == List((1L, 1, 1), (2L, 1, 3), (3L, 2, 1)))
    val aaa = Search.phraseSearch(d, Seq("a", "a", "a"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    // overlapping matches count individually: positions 1 and 2
    assert(aaa == List((4L, 2, 1)))
  }

  test("phrase search: single-token phrase degenerates to term lookup") {
    val d = toks(1L -> "q w e", 2L -> "w w", 3L -> "zz")
    val out = Search.phraseSearch(d, Seq("w"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    assert(out == List((1L, 1, 2), (2L, 2, 1)))
  }

  // ---------------------------------------------------------------
  // hybridRrf
  // ---------------------------------------------------------------

  test("RRF fusion: both-pool docs sum contributions; one-sided docs rank by their single term") {
    // docs 1..3 contain the query term with tf 3/2/1 → lexical ranks
    // 1/2/3; doc 4 has no query term (dense-only candidate)
    val d = toks(
      1L -> "term term term pad",
      2L -> "term term pad pad",
      3L -> "term pad pad pad",
      4L -> "pad pad pad pad")
    // probe id 0; dense cosine order by construction: 1 > 2 > 3 > 4
    def v(x: Double) = Array(x.toFloat, math.sqrt(1 - x * x).toFloat)
    val e = Seq(
      (0L, v(1.0), 0), (1L, v(0.9), 0), (2L, v(0.8), 0),
      (3L, v(0.7), 0), (4L, v(0.6), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Search.hybridRrf(d, e, queryTerms = Seq("term"),
        probeId = 0L, poolK = 3, rrfK = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val byDoc = out.map(r => r._1 -> r).toMap
    // doc 1: lex rank 1 + dense rank 1
    assert(byDoc(1L)._2 == 1 && byDoc(1L)._3 == 1)
    assert(math.abs(byDoc(1L)._4 - (1.0 / 61 + 1.0 / 61)) < 1e-6)
    // doc 4: missed the poolK=3 dense cut and has no query term → absent
    assert(!byDoc.contains(4L))
    // doc 3: lexical rank 3, dense rank 3
    assert(byDoc(3L)._2 == 3 && byDoc(3L)._3 == 3)
    // fused order is by summed score: 1, 2, 3
    assert(out.map(_._1).toList == List(1L, 2L, 3L))
  }

  test("RRF fusion: a dense-only doc carries a zero lexical rank") {
    val d = toks(1L -> "term x", 2L -> "y z")
    def v(x: Double) = Array(x.toFloat, math.sqrt(1 - x * x).toFloat)
    val e = Seq((0L, v(1.0), 0), (1L, v(0.5), 0), (2L, v(0.9), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Search.hybridRrf(d, e, queryTerms = Seq("term"),
        probeId = 0L, poolK = 2, rrfK = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    // doc 2: no query term → lex_rank 0, dense rank 1
    assert(out.contains((2L, 0, 1)))
    // doc 1: lex rank 1, dense rank 2
    assert(out.contains((1L, 1, 2)))
  }

  // ---------------------------------------------------------------
  // rerank
  // ---------------------------------------------------------------

  test("rerank: hand-computed features and readout on a 4-doc pool") {
    // probe id 0; dense cosine order 1 > 2 > 3 > 4 by construction
    val d = toks(
      1L -> "term term term pad",  // cov 1/1, qtf 3/4, first_pos 1
      2L -> "pad term pad pad",    // cov 1,   qtf 1/4, first_pos 2
      3L -> "pad pad pad term",    // cov 1,   qtf 1/4, first_pos 4
      4L -> "pad pad pad pad")     // cov 0,   qtf 0,   first_pos 0
    def v(x: Double) = Array(x.toFloat, math.sqrt(1 - x * x).toFloat)
    val e = Seq(
      (0L, v(1.0), 0), (1L, v(0.9), 0), (2L, v(0.8), 0),
      (3L, v(0.7), 0), (4L, v(0.6), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Search.rerank(d, e, queryTerms = Seq("term"),
        probeId = 0L, poolK = 4, rrfK = 60, topN = 10)
      .collect()
    val byDoc = out.map(r => r.getLong(0) -> r).toMap
    val (wRrf, wCov, wQtf, wPos, wLen) = Search.RerankWeights
    def f(id: Long, c: String) = byDoc(id).getDouble(byDoc(id).fieldIndex(c))
    // features: doc 1
    assert(f(1L, "cov") == 1.0 && f(1L, "qtf") == 0.75)
    assert(byDoc(1L).getLong(byDoc(1L).fieldIndex("first_pos")) == 1L)
    assert(f(1L, "pos_feat") == 1.0)
    // all docs have dl = 4 = avgdl → len_prior |ln 1| = 0
    assert(out.forall(r => r.getDouble(r.fieldIndex("len_prior")) == 0.0))
    // doc 4: dense-only — no query term
    assert(f(4L, "cov") == 0.0 && f(4L, "qtf") == 0.0 && f(4L, "pos_feat") == 0.0)
    // readout: doc 2 (ranks 2/2) vs hand formula
    val rrf2 = math.rint((1.0 / 62 + 1.0 / 62) * 1e6) / 1e6
    val want2 = math.rint(
      (wRrf * rrf2 + wCov * 1.0 + wQtf * 0.25 + wPos * 0.5 - wLen * 0.0) * 1e6) / 1e6
    assert(f(2L, "rerank") == want2)
    // a missing term can never outrank a position-1 hit on pos_feat
    assert(f(1L, "pos_feat") > f(4L, "pos_feat"))
    // order: rerank desc
    val scores = out.map(r => r.getDouble(r.fieldIndex("rerank"))).toList
    assert(scores == scores.sorted.reverse)
  }

  test("rerank: empty-token doc entering via the dense arm gets finite features") {
    // r11 advice regression: dl = 0 made qtf a divide-by-zero (NULL in
    // Spark) and len_prior an ln(0) (error in the DuckDB oracle). The
    // greatest(dl, 1) convention scores the empty doc as a 1-token doc.
    // built directly: split("") yields [""], not an empty array
    val d = Seq((1L, Seq("term", "pad")), (2L, Seq.empty[String]))
      .toDF("doc_id", "toks")
    def v(x: Double) = Array(x.toFloat, math.sqrt(1 - x * x).toFloat)
    val e = Seq((0L, v(1.0), 0), (1L, v(0.9), 0), (2L, v(0.95), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Search.rerank(d, e, queryTerms = Seq("term"),
        probeId = 0L, poolK = 4, rrfK = 60, topN = 10).collect()
    val byDoc = out.map(r => r.getLong(0) -> r).toMap
    assert(byDoc.contains(2L), "empty doc should enter via the dense pool")
    val r2 = byDoc(2L)
    def g(c: String) = r2.getDouble(r2.fieldIndex(c))
    assert(g("qtf") == 0.0)
    // dl convention 1, avgdl = (2 + 0) / 2 = 1 → len_prior |ln 1| = 0
    assert(g("len_prior") == 0.0)
    assert(!g("rerank").isNaN && out.forall(r =>
      !r.getDouble(r.fieldIndex("rerank")).isNaN))
  }

  test("rerank: length prior penalizes run-on and stub docs symmetrically") {
    val d = toks(
      1L -> "term pad",                      // dl 2
      2L -> ("term " + ("pad " * 7)).trim)   // dl 8; avgdl 5
    def v(x: Double) = Array(x.toFloat, math.sqrt(1 - x * x).toFloat)
    val e = Seq((0L, v(1.0), 0), (1L, v(0.9), 0), (2L, v(0.8), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Search.rerank(d, e, queryTerms = Seq("term"),
        probeId = 0L, poolK = 4, rrfK = 60, topN = 10).collect()
    val byDoc = out.map(r => r.getLong(0) -> r).toMap
    def lp(id: Long) = byDoc(id).getDouble(byDoc(id).fieldIndex("len_prior"))
    assert(lp(1L) == math.rint(math.abs(math.log(2.0 / 5.0)) * 1e6) / 1e6)
    assert(lp(2L) == math.rint(math.abs(math.log(8.0 / 5.0)) * 1e6) / 1e6)
  }

  // ---------------------------------------------------------------
  // skyline
  // ---------------------------------------------------------------

  test("skyline sweep matches the brute-force dominance definition") {
    // deterministic pseudo-random points, with planted duplicates and
    // same-date/same-price collisions
    val rows = (0 until 400).map { i =>
      val price = ((i * 7919) % 97).toDouble
      val day = (i * 104729) % 31
      (i.toLong, price, java.sql.Date.valueOf(f"2024-01-${day + 1}%02d"))
    }
    val df = rows.toDF("id", "price", "d")
    val got = Relational.skyline(df, "price", "d")
      .select("id").as[Long].collect().toSet
    val brute = rows.filter { case (_, p, d) =>
      !rows.exists { case (_, p2, d2) =>
        p2 <= p && !d2.before(d) && (p2 < p || d2.after(d))
      }
    }.map(_._1).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("skyline keeps all rows tied on (price, date)") {
    val df = Seq(
      (1L, 5.0, java.sql.Date.valueOf("2024-01-10")),
      (2L, 5.0, java.sql.Date.valueOf("2024-01-10")), // exact tie: both kept
      (3L, 9.0, java.sql.Date.valueOf("2024-01-10")), // same date, pricier: dominated
      (4L, 4.0, java.sql.Date.valueOf("2024-01-05"))  // cheaper but older: kept
    ).toDF("id", "price", "d")
    val got = Relational.skyline(df, "price", "d")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L))
  }

  // ---------------------------------------------------------------
  // centroidDrift
  // ---------------------------------------------------------------

  test("centroid drift: hand-computed centroids and cosine") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(2.0f, 0.0f), 1), (4L, Array(4.0f, 0.0f), 1),
      (5L, Array(0.0f, -1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDrift(e)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // centroids: l0 = (.5, .5), l1 = (3, 0), l2 = (0, -1)
    assert(out((0, 1)) == ((2L, 2L, 0.707107)))  // cos 45°
    assert(out((0, 2)) == ((2L, 1L, -0.707107)))
    assert(out((1, 2)) == ((2L, 1L, 0.0)))
  }

  test("centroid drift: sub-2^-50-grid value trips the exactness guard") {
    // 2^-51 as a float: x * 2^50 = 0.5 — not integral, must raise
    val tiny = java.lang.Float.intBitsToFloat(((127 - 51) << 23))
    assert(tiny.toDouble == math.pow(2, -51))
    val e = Seq((1L, Array(tiny, 0.0f), 0), (2L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      Similarity.centroidDrift(e).collect()
    }
    assert(ex.getMessage.contains("fraction bits"))
  }
}
