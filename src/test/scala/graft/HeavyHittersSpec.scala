package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAggregator

/** The Misra–Gries guarantee and the two-pass exact heavy hitters
  * built on it. The sketch tests drive the Aggregator directly (reduce
  * and merge in adversarial orders — Spark may combine partials in any
  * order); the end-to-end tests pin [[ops.TextAnalysis.heavyHitters]]
  * against an exact groupBy on the same data. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Fold a token stream through the aggregator like one partition. */
  private def sketch(agg: MisraGriesAggregator, toks: Seq[String]) =
    toks.foldLeft(agg.zero)(agg.reduce)

  test("MG guarantee: any item above N/(k+1) survives an adversarial stream") {
    val k = 9
    val agg = new MisraGriesAggregator(k)
    // 300 'hot' among 700 distinct rare fillers, hot interleaved last —
    // the worst case for decrement pressure
    val fillers = (1 to 700).map(i => s"rare_$i")
    val stream = fillers.take(350) ++ Seq.fill(300)("hot") ++ fillers.drop(350)
    val n = stream.length                       // 1000, thr = 100
    assert(300 > n / (k + 1))
    val s = sketch(agg, stream)
    assert(s.contains("hot"), s"hot item evicted: $s")
    assert(s.size <= k)
    // undercount bounded by N/(k+1)
    assert(s("hot") >= 300 - n / (k + 1))
  }

  test("MG merge preserves the bound across arbitrary partition splits") {
    val k = 9
    val agg = new MisraGriesAggregator(k)
    val stream = (1 to 900).map(i => s"rare_$i") ++ Seq.fill(200)("hot")
    // three different split points, merged in both orders
    for (cut <- Seq(100, 550, 1000)) {
      val (a, b) = stream.splitAt(cut)
      val merged1 = agg.merge(sketch(agg, a), sketch(agg, b))
      val merged2 = agg.merge(sketch(agg, b), sketch(agg, a))
      for (m <- Seq(merged1, merged2)) {
        assert(m.size <= k)
        assert(m.contains("hot"), s"cut=$cut lost the heavy hitter: $m")
        assert(m("hot") >= 200 - stream.length / (k + 1))
      }
    }
  }

  test("heavyHitters == exact GROUP BY/HAVING on the sf0.001 corpus") {
    val docToks = Tables.docTokens(spark, TestSpark.sf0001)
    val k = 199
    val got = ops.TextAnalysis.heavyHitters(docToks, k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = docToks.select(explode(col("toks")).as("t"))
    val n = toks.count()
    val expected = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / (k + 1))
      .orderBy(col("cnt").desc, col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "degenerate test: no heavy hitters in corpus")
  }

  test("heavyHittersByGroup == exact per-group GROUP BY/HAVING on sf0.001") {
    val docToks = Tables.docTokens(spark, TestSpark.sf0001)
    val k = 99
    val got = ops.TextAnalysis.heavyHittersByGroup(docToks, "lang", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val toks = docToks.select(col("lang").as("g"), explode(col("toks")).as("t"))
    val tot = toks.groupBy("g").agg(count(lit(1)).as("n"))
    val expected = toks.groupBy("g", "t").agg(count(lit(1)).as("cnt"))
      .join(tot, "g")
      .filter(col("cnt") > col("n") / (k + 1))
      .orderBy(col("g"), col("cnt").desc, col("t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)
    // more than one group actually represented
    assert(got.map(_._1).distinct.length > 1)
  }

  test("heavyHittersNearMax == exact half-the-mode HAVING on sf0.001") {
    val docToks = Tables.docTokens(spark, TestSpark.sf0001)
    val k = 1999
    val got = ops.TextAnalysis.heavyHittersNearMax(docToks, k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = docToks.select(explode(col("toks")).as("t"))
    val n = toks.count()
    val cnts = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val mx = cnts.agg(max(col("cnt"))).head().getLong(0)
    val expected = cnts
      .filter(col("cnt") * 2 > mx && col("cnt") * (k + 1) > n)
      .orderBy(col("cnt").desc, col("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "degenerate test: no near-max hitters in corpus")
  }

  test("heavyHittersNearMax: support scales with the mode, not the stream") {
    val spark0 = spark
    import spark0.implicits._
    // mode 'a'×40; 'b'×25 is above mx/2, 'c'×15 below; fillers rare.
    // An absolute 1/(k+1) threshold with k=9 (10%) would also admit
    // 'c' (15%) — the near-max form must not
    val docs = Seq((1L,
      (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(15)("c") ++
       (1 to 20).map(i => s"f$i")).mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val hh = ops.TextAnalysis.heavyHittersNearMax(docs, k = 9)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq == Seq(("a", 40L), ("b", 25L)))
  }

  test("heavyHittersByGroupNearMax: per-group modes set per-group supports") {
    val spark0 = spark
    import spark0.implicits._
    // group g1: mode x×10, y×6 qualifies, z×4 doesn't;
    // group g2: mode z×8 — z qualifies HERE despite failing in g1
    val docs = Seq(
      ("g1", (Seq.fill(10)("x") ++ Seq.fill(6)("y") ++ Seq.fill(4)("z")).mkString(" ")),
      ("g2", Seq.fill(8)("z").mkString(" "))
    ).toDF("lang", "text")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("toks", split(col("text"), " "))
    val hh = ops.TextAnalysis.heavyHittersByGroupNearMax(docs, "lang", k = 99)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(hh.toSeq == Seq(("g1", "x", 10L), ("g1", "y", 6L), ("g2", "z", 8L)))
  }

  test("heavyHitters: planted skew dominates") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"common token_$i x$i y$i"))
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    val hh = ops.TextAnalysis.heavyHitters(docs, k = 9).collect()
    // 'common' appears 50/200 = 25% > 10% threshold; every other token
    // is ~1-2 occurrences
    assert(hh.map(_.getString(0)).contains("common"))
    assert(hh.find(_.getString(0) == "common").get.getLong(1) == 50L)
  }
}
