package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BpeTrain, Curation, Dedup, Graph, Links, Quant, TextAnalysis}

/** Degenerate-input hardening for the r7 operators: empty inputs,
  * single elements, and boundary shapes must degrade to sane empty/
  * identity results, never throw — the library contract a pipeline
  * composing these unattended depends on. */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: empty edge list yields an empty result, not a crash") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pageRank(empty, iters = 3).count() === 0)
  }

  test("pageRank: single self-loop node holds all the mass") {
    val r = Graph.pageRank(Seq("a" -> "a").toDF("src", "dst"), iters = 5)
      .collect()
    assert(r.length == 1 && math.abs(r.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("degreeStats: empty edges -> empty report") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.degreeStats(empty).count() === 0)
  }

  test("containmentPairs: single-token docs and identical docs behave") {
    val docs = Seq(
      (1L, Seq("alpha"), "en"),
      (2L, Seq("alpha"), "en"),      // identical single-token set: c = 1 both ways
      (3L, Seq("beta"), "en")
    ).toDF("doc_id", "toks", "lang")
    val out = Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (2L, 1L)))
  }

  test("temperatureMix: single-language corpus gets the plain half quota") {
    val docs = Seq.tabulate(20) { i =>
      (i.toLong, s"t$i", "en", "s", 2L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.temperatureMix(docs)
    assert(out.count() === 10) // n = (20 div 2) * s / s = 10
  }

  test("learnBpeMerges: corpus of single-char words exhausts early, no pairs") {
    val docs = Seq((1L, Seq("a", "b", "a"))).toDF("doc_id", "toks")
    assert(BpeTrain.learnBpeMerges(docs, nMerges = 5).count() === 0)
  }

  test("extractLinks/anchorStats: empty corpus is an empty rollup") {
    val none = Seq.empty[(Long, String)].toDF("doc_id", "html")
    assert(Links.anchorStats(Links.extractLinks(none)).count() === 0)
  }

  test("perplexityKn: a single two-token doc scores against its own LM") {
    val d = Seq((1L, Seq("x", "y"))).toDF("doc_id", "toks")
    val r = TextAnalysis.perplexityKn(d).collect()
    // one bigram, P(y|x) = max(1-.75,0)/1 + .75*1/1*(1/1) = 1.0 → ppl 1
    assert(r.length == 1 && math.abs(r.head.getDouble(3) - 1.0) < 1e-9)
  }

  test("quantizedTopK: corpus smaller than k returns what exists, ranked") {
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Quant.quantizedTopK(emb, nProbes = 1, k = 10).collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
  }

  test("projectEmbeddings: zero vector projects to the zero vector") {
    val emb = Seq((0L, Array.fill(64)(0f))).toDF("vec_id", "embedding")
    val p = Quant.projectEmbeddings(emb).collect().head.getSeq[Double](1)
    assert(p.forall(_ == 0.0))
  }

  test("bm25: empty query list and no-match query both yield empty, not a crash") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    assert(Graft.bm25(docs, Seq.empty).count() === 0)
    assert(Graft.bm25(docs, Seq("zeta")).count() === 0)
  }

  test("transitions/eventPaths: single-event users produce no hops") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq((1L, 1L, t("2024-01-01 10:00:00"), "a"),
                 (2L, 2L, t("2024-01-01 11:00:00"), "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(Graft.transitions(ev).count() === 0)
    assert(Graft.eventPaths(ev).count() === 0)
  }

  test("embedOutliers: single vector gets z = 0 (null stddev guard)") {
    val emb = Seq((7L, Array(3f, 4f))).toDF("vec_id", "embedding")
    val out = Graft.embedOutliers(emb).collect()
    // the only vector IS the centroid: dist 0, sd NULL -> z defined 0
    assert(out.length == 1 && out.head.getDouble(1) == 0.0
      && out.head.getDouble(2) == 0.0)
  }

  test("embedOutliers: identical vectors (sd = 0) all get z = 0") {
    val emb = (1L to 4L).map(i => (i, Array(1f, 2f))).toDF("vec_id", "embedding")
    val out = Graft.embedOutliers(emb).collect()
    assert(out.length == 4 && out.forall(_.getDouble(2) == 0.0))
  }

  test("sourceOverlap/contaminationRate: single source -> no pairs, zero rate") {
    val docs = Seq((1L, "t1", "only", "en"), (2L, "t1", "only", "en"))
      .toDF("doc_id", "text", "source", "lang")
    assert(Graft.sourceOverlap(docs).count() === 0) // no second source
    val cr = Graft.contaminationRate(docs).collect()
    // intra-source dup still counts: both docs share a text
    assert(cr.length == 1 && cr.head.getLong(2) == 2L)
  }

  test("qualityTiers: fewer docs than tiers yields sparse tier ids, counts sum") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "w w"))
      .toDF("doc_id", "text")
    val out = Graft.qualityTiers(docs, tiers = 4).collect()
    assert(out.map(_.getLong(1)).sum == 2L) // every doc in exactly one tier
    assert(out.map(_.getInt(0)).distinct.length == out.length)
  }

  test("null text: contaminationRate keeps the doc in n_docs, qualityTiers skips it") {
    val docs = Seq((1L, "real text", "s1", "en"), (2L, null, "s1", "en"),
                   (3L, null, "s1", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val cr = Graft.contaminationRate(docs).collect().head
    // 3 docs counted; the two nulls are NOT "the same text" as each other
    assert(cr.getLong(1) == 3L && cr.getLong(2) == 0L)
    val tiers = Graft.qualityTiers(docs.select(col("doc_id"), col("text")), 2)
      .collect()
    assert(tiers.map(_.getLong(1)).sum == 1L) // only the scored doc tiers
    // all-null corpus: empty report, not a crash
    val empty = Graft.qualityTiers(
      Seq((9L, null: String)).toDF("doc_id", "text"), 2).collect()
    assert(empty.isEmpty)
  }

  test("weightedSample: empty token array weighs 0 and is never kept (no ANSI crash)") {
    // the ratio terms divide by n_toks; TestSpark runs ANSI mode, so
    // without the zero guard this row would throw DIVIDE_BY_ZERO (and
    // with ANSI off, least() skipping the NULLs would hand the empty
    // doc the MAXIMUM weight instead of none)
    val docs = Seq((1L, Seq.empty[String]), (2L, Seq("tok1", "tok2")))
      .toDF("doc_id", "toks")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val out = Graft.weightedSample(docs).collect()
    assert(!out.map(_.getLong(0)).contains(1L), out.mkString(","))
  }

  test("attribution: horizon boundary, no-touch, post-conversion touch, and tie cases") {
    import java.sql.Timestamp
    def t(min: Long, us: Long = 0) = new Timestamp(min * 60000 + us / 1000)
    val ev = Seq(
      // user 1: click 00:00, purchase 00:30 — inside 1h horizon
      (1L, 1L, t(0), "click", 0.0), (2L, 1L, t(30), "purchase", 10.0),
      // user 2: view 00:00, purchase 01:00 sharp — ts <= lt_ts + 1h is inclusive
      (3L, 2L, t(0), "view", 0.0), (4L, 2L, t(60), "purchase", 20.0),
      // user 3: click 00:00, purchase 01:01 — outside horizon -> direct
      (5L, 3L, t(0), "click", 0.0), (6L, 3L, t(61), "purchase", 40.0),
      // user 4: no touch at all -> direct
      (7L, 4L, t(5), "purchase", 80.0),
      // user 5: touch AFTER the conversion never attributes (frame ends at -1)
      (8L, 5L, t(10), "purchase", 160.0), (9L, 5L, t(11), "click", 0.0),
      // user 6: view then click at the SAME instant as the purchase —
      // same-ts touch with smaller event_id still precedes in row order
      (10L, 6L, t(20), "view", 0.0), (11L, 6L, t(25), "click", 0.0),
      (12L, 6L, t(25), "purchase", 320.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Graft.attribution(ev, Seq("view", "click"), "purchase", "1 HOUR")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(out == List(
      ("click", 2L, 330.0),   // users 1, 6
      ("direct", 3L, 280.0),  // users 3 (stale), 4 (none), 5 (late touch)
      ("view", 1L, 20.0)))    // user 2, exactly on the boundary
  }

  test("intervalJoin: exactly-once pairs across shared buckets, touching endpoints, disjoint") {
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000)
    // 1-minute buckets; intervals span many buckets to force shared-
    // bucket candidates that must still surface exactly once
    val a = Seq(
      ("a1", t(0), t(10)),    // overlaps b1 (shares 11 buckets) and b2 at a point
      ("a2", t(20), t(30)),   // disjoint from everything
      ("a3", t(40), t(45))    // contained inside b3
    ).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      ("b1", t(0), t(10)),    // identical to a1
      ("b2", t(10), t(12)),   // touches a1 exactly at t=10 (closed: overlap)
      ("b3", t(35), t(50))    // contains a3
    ).toDF("b_id", "b_s", "b_e")
    val out = Graft.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e", "1 minute")
      .select("a_id", "b_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a1", "b1"), ("a1", "b2"), ("a3", "b3")))
    // and once means once: no duplicate rows before the toSet
    val n = Graft.intervalJoin(a, b, "a_s", "a_e", "b_s", "b_e", "1 minute").count()
    assert(n == 3, s"expected 3 pairs, got $n")
  }

  test("intervalJoin: month-bucket widths are rejected, zero width is rejected") {
    val df = Seq(("x", new java.sql.Timestamp(0), new java.sql.Timestamp(1)))
      .toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      Graft.intervalJoin(df, df.select(col("id").as("i2"), col("s").as("s2"), col("e").as("e2")),
                         "s", "e", "s2", "e2", "1 month")
    }
  }

  test("NfcNormalize: codegen and interpreted agree with JDK Normalizer; null and zero-copy paths") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.NfcNormalize
    val cases = Seq(
      "Cafe\u0301 du Monde",  // decomposed -> composes
      "already caf\u00E9",    // precomposed -> identity
      "A\u030A",              // combining ring
      "plain ascii stays",         // ASCII fast path
      "")                          // empty
    for (s <- cases) {
      val expect = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      // interpreted eval
      val got = NfcNormalize(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)).eval(null)
      assert(got.toString == expect, s"interpreted: $s")
    }
    // codegen path through a real DataFrame (whole-stage codegen on)
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val out = Graft.normalizeText(df).collect().map(_.getString(1))
    val expect = cases.map(s => java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC).toLowerCase.trim
      .replaceAll("\\s+", " "))
    assert(out.toSeq == expect, out.mkString("|"))
    // null text -> null norm, no crash
    val withNull = Seq((1L, null: String), (2L, "ok")).toDF("doc_id", "text")
    val n = Graft.normalizeText(withNull).collect()
    assert(n(0).isNullAt(1) && n(1).getString(1) == "ok")
  }

  test("attribution: conversion type in touch list is rejected") {
    val ev = Seq((1L, 1L, new java.sql.Timestamp(0L), "x", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    intercept[IllegalArgumentException] {
      Graft.attribution(ev, Seq("x"), "x")
    }
  }

  test("dsir + crossPerplexity: an EMPTY target slice degrades gracefully, never crashes") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((0L, "a b c", "raw"), (1L, "d e f", "raw"))
      .toDF("doc_id", "text", "source")
    val never = col("source") === "no_such_source"
    // DSIR: c_t = 0 everywhere → every weight is the finite constant
    // class ln(1/(0+B)) − ln((c_r+1)/(n_r+B)); scores finite, all docs out
    val w = Graft.dsirWeights(docs, never, topK = 10).collect()
    assert(w.length == 2 && w.forall(r => !r.getDouble(2).isNaN
      && !r.getDouble(2).isInfinite))
    // cross-ppl: N_t = 0 → uniform LM P(w) = 1/V; ppl = V exactly (V = 6)
    val p = Graft.crossPerplexity(docs, never).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(p.values.forall(v => math.abs(v - 6.0) < 1e-6), s"$p")
    // model artifact path: finite default and weights
    val (model, default) = Graft.dsirModel(docs, never)
    assert(!default.isNaN && model.values.forall(v => !v.isNaN))
  }

  // ---- r8 operators on empty / degenerate inputs ----

  private def emptyEvents =
    Seq.empty[(Long, java.sql.Timestamp, String, Double, Long)]
      .toDF("event_id", "ts", "event_type", "value", "user_id")

  test("r8 event-time family: empty event stream -> empty reports, no crash") {
    assert(Graft.gapFillHourly(emptyEvents).count() === 0)
    assert(Graft.ewmaDaily(emptyEvents).count() === 0)
    assert(Graft.rollingQuantilesDaily(emptyEvents).count() === 0)
    assert(Graft.seasonalAnomaly(emptyEvents).count() === 0)
    assert(Graft.robustOutliers(emptyEvents).count() === 0)
    assert(Graft.cusum(emptyEvents).count() === 0)
    assert(Graft.rollingActives(emptyEvents).count() === 0)
    assert(Graft.rfm(emptyEvents).count() === 0)
    assert(Graft.marketBasket(emptyEvents).count() === 0)
  }

  test("r8 fuzzy family: empty and single-string inputs") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    assert(Graft.fuzzyPairs(empty, "id", "s").count() === 0)
    assert(Graft.resolveEntities(empty, "id", "s").count() === 0)
    val one = Seq((1L, "alone")).toDF("id", "s")
    assert(Graft.fuzzyPairs(one, "id", "s").count() === 0)
    val r = Graft.resolveEntities(one, "id", "s").collect()
    assert(r.length == 1 && r.head.getLong(2) == 1L && r.head.getBoolean(4))
  }

  test("r8 profile family: empty and constant inputs behave") {
    val empty = Seq.empty[(String, String)].toDF("a", "b")
    assert(Graft.assocStats(empty, "a", "b").count() === 0)
    val emptyNum = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(Graft.gini(emptyNum, "g", "id", "v").count() === 0)
    assert(Graft.winsorize(emptyNum, "g", "v").count() === 0)
    assert(Graft.benford(Seq.empty[Double].toDF("v"), "v").count() === 0)
    // single-category association: minrc = 1 → V divides by zero →
    // must be null/NaN-free handling or a defined degenerate
    val mono = Seq(("x", "y"), ("x", "y")).toDF("a", "b")
    val m = Graft.assocStats(mono, "a", "b").collect()
    assert(m.length == 1 && m.head.getDouble(m.head.fieldIndex("chi2_total")) == 0.0)
  }

  test("r8 sssp/modularity: empty graphs") {
    val e = Seq.empty[(String, String, Long)].toDF("src", "dst", "cost")
    assert(Graft.sssp(e, Seq.empty[String].toDF("node")).count() === 0)
    assert(Graft.modularity(
      Seq.empty[(String, String)].toDF("src", "dst"),
      Seq.empty[(String, String)].toDF("node", "community")).count() === 0)
  }

  test("r8 binning/drift: constant column degenerates cleanly") {
    // all-equal values: every quantile edge identical → one bin
    val const = Seq.fill(100)((5.0, 1.0)).toDF("v", "t")
    val bins = Graft.quantileBins(const, "v", "t").collect()
    assert(bins.map(_.getLong(1)).sum == 100L)
    assert(bins.length == 1 && bins.head.getInt(0) == 1)
    val psi = Graft.psiDrift(const, const, "v").collect()
    assert(psi.head.getDouble(psi.head.fieldIndex("psi")) == 0.0)
  }
}
