package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BpeTrain

/** BPE merge learning golden: the distributed learner must reproduce
  * an INDEPENDENT single-node Sennrich-style implementation merge for
  * merge on the real corpus, be deterministic, and learn a planted
  * dominant digraph first. */
class BpeLearnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent single-node reference: word-frequency map, repeated
    * weighted adjacent-pair argmax (count desc, then lexicographic)
    * and left-to-right non-overlapping merge. */
  private def referenceLearn(words: Map[String, Long],
                             nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => w.split("").toVector -> f }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a, b, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val m = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              m += (a + b); i += 2
            } else { m += syms(i); i += 1 }
          }
          m.result()
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("golden: distributed learner == single-node reference on the corpus") {
    val d = Tables.docTokens(spark, TestSpark.sf0001)
    val learned = BpeTrain.learnBpeMerges(d, nMerges = 20)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val wordFreq = d.select(explode(col("toks")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceLearn(wordFreq, 20)
    assert(learned == expected)
  }

  test("deterministic: two runs produce the identical merge table") {
    val d = Tables.docTokens(spark, TestSpark.sf0001)
    val a = BpeTrain.learnBpeMerges(d, 8).collect().toSeq
    val b = BpeTrain.learnBpeMerges(d, 8).collect().toSeq
    assert(a == b)
  }

  test("batched rounds == one-merge-per-round == reference (r10)") {
    val d = Tables.docTokens(spark, TestSpark.sf0001)
    val batched = BpeTrain.learnBpeMerges(d, nMerges = 20, batchMax = 64)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val oneAtATime = BpeTrain.learnBpeMerges(d, nMerges = 20, batchMax = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(batched == oneAtATime)
  }

  test("production shape: nMerges well past batchMax — batched ≡ greedy ≡ reference (r11)") {
    // the documented ~30k-merge production case in miniature: the
    // merge count exceeds the collect window severalfold, so every
    // window is TRUNCATED (the windowMax tail trim must fire every
    // round) and the learner must cross many batch boundaries without
    // ever diverging from one-at-a-time greedy
    val d = Tables.docTokens(spark, TestSpark.sf0001)
    // ask for more merges than the corpus has: the learner must run
    // the vocabulary to FULL exhaustion (~89 merges on this fixture —
    // every word a single symbol), crossing many truncated windows
    val n = 120
    val batched = BpeTrain.learnBpeMerges(d, nMerges = n, batchMax = 16)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val oneAtATime = BpeTrain.learnBpeMerges(d, nMerges = n, batchMax = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(batched.size > 5 * 16, s"corpus too small to cross windows: ${batched.size}")
    assert(batched == oneAtATime)
    val wordFreq = d.select(explode(col("toks")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batched == referenceLearn(wordFreq, n))
  }

  test("greedyBatch: stops at first conflict, trims count ties, never empty") {
    // top-2 conflict (share 'b'): fall back to the argmax alone
    assert(BpeTrain.greedyBatch(
      Seq(("a", "b", 10L), ("b", "c", 9L), ("d", "e", 8L)), 20)
      == Seq(("a", "b", 10L)))
    // disjoint prefix accepted, conflicting tail excluded
    assert(BpeTrain.greedyBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L), ("ab", "x", 8L)), 20)
      == Seq(("a", "b", 10L), ("c", "d", 9L)))
    // tie with the first excluded candidate is trimmed (its merged
    // instances could feed an equal-count new pair)
    assert(BpeTrain.greedyBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L), ("a", "x", 9L)), 20)
      == Seq(("a", "b", 10L)))
    // all-tied window: trim would empty the batch -> argmax survives
    assert(BpeTrain.greedyBatch(
      Seq(("a", "b", 5L), ("a", "c", 5L)), 20) == Seq(("a", "b", 5L)))
    // limit cap applies and the next candidate's count still trims
    assert(BpeTrain.greedyBatch(
      Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L)), 2)
      == Seq(("a", "b", 10L), ("c", "d", 9L)))
  }

  test("greedyBatch: conflict-free full window trims on windowMax, not limit") {
    // r10 advice (medium): window collected with limit(3) comes back
    // full and conflict-free while limit(=remaining merges) is larger
    // — out-of-window pairs can tie the tail count, so the tail-count
    // trim MUST fire. Before the fix this returned all 3 untrimmed.
    val top = Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L))
    assert(BpeTrain.greedyBatch(top, 20, windowMax = 3)
      == Seq(("a", "b", 10L), ("c", "d", 9L)))
    // tie at the tail: both tail-tied members trimmed
    val tied = Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 8L))
    assert(BpeTrain.greedyBatch(tied, 20, windowMax = 3)
      == Seq(("a", "b", 10L)))
    // fully-enumerated window (size < windowMax): nothing beyond
    // exists, nothing is trimmed
    assert(BpeTrain.greedyBatch(top, 20, windowMax = 64) == top)
  }

  test("planted dominant digraph is learned first, then its trigram") {
    val docs = Seq(
      (1L, Seq("thth", "ththth", "the", "xy")),
      (2L, Seq("thth", "the", "zq"))
    ).toDF("doc_id", "toks")
    val m = BpeTrain.learnBpeMerges(docs, 3)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(m(0) == ("t", "h")) // "th" dominates every other pair
    assert(m(1) == ("th", "th")) // then the repeated-digraph merge
  }
}
