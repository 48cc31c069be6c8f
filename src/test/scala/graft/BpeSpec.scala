package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe
import graft.ops.{Curation, TextAnalysis}

/** Golden for the oracle-exempt q_token_bpe: the distributed count
  * must equal an INDEPENDENTLY-WRITTEN single-node reference BPE
  * (different algorithm shape: repeated full-table rank sweep with
  * list rebuild, vs the engine's in-place scan), plus the classic BPE
  * properties and the pack-in-token-space wiring. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation, written independently of
    * [[Bpe.encodeWord]]: applies merges IN RANK ORDER — for each rule
    * in table order, merge all its occurrences until none remain,
    * then move to the next rule, restarting from rule 0 after any
    * change. Equivalent to greedy lowest-rank-first by construction
    * (the restart guarantees no lower-rank pair is ever present when
    * a higher-rank rule fires). */
  private def referenceEncode(word: String): List[String] = {
    var syms = word.map(_.toString).toList
    var changed = true
    while (changed) {
      changed = false
      val it = Bpe.Merges.iterator
      while (!changed && it.hasNext) {
        val (a, b) = it.next()
        def mergeOnce(l: List[String]): List[String] = l match {
          case x :: y :: rest if x == a && y == b => (x + y) :: mergeOnce(rest)
          case x :: rest => x :: mergeOnce(rest)
          case Nil => Nil
        }
        val merged = mergeOnce(syms)
        if (merged != syms) { syms = merged; changed = true }
      }
    }
    syms
  }

  test("q_token_bpe matches the independent single-node reference on the corpus") {
    val got = TextAnalysis.qTokenBpe(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val docs = Tables.docTokens(spark, TestSpark.sf0001)
      .select("doc_id", "toks").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val want = docs.map { case (id, toks) =>
      (id, toks.size,
       toks.filter(_.nonEmpty).map(w => referenceEncode(w).length).sum)
    }.sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._3)) == want.map(t => (t._1, t._3)))
    assert(got.map(_._2) == want.map(_._2))
  }

  test("per-word greedy merge: hierarchy reaches the full-word tokens") {
    assert(Bpe.encodeWord("value") == Vector("value"))
    assert(Bpe.encodeWord("window") == Vector("window"))
    assert(Bpe.encodeWord("values") == Vector("value", "s"))
    assert(Bpe.encodeWord("xyz") == Vector("x", "y", "z"))
    assert(Bpe.encodeWord("") == Vector())
  }

  test("vocabulary-prefix monotonicity: more merges never increase the count") {
    val words = Seq("value", "window", "spark", "quarter", "tablets",
                    "fastest", "scanner", "ordering", "small", "batch")
    val sizes = Seq(0, 5, 10, 20, 40, Bpe.Merges.length).map { k =>
      val ranks = Bpe.Merges.take(k).zipWithIndex.toMap
      words.map(w => Bpe.encodeWord(w, ranks).length).sum
    }
    assert(sizes == sizes.sorted.reverse,
      s"counts must be non-increasing in vocab size: $sizes")
    // and with NO merges, count == character count
    assert(sizes.head == words.map(_.length).sum)
  }

  test("bpeTokens column: subword stream agrees with the count and is lossless") {
    Bpe.register(spark)
    val rows = Seq((1L, Seq("value", "windows", "xyz")),
                   (2L, Seq("spark", "", "query")))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), Bpe.bpeTokens(col("toks")).as("bpe"),
              Bpe.bpeCount(col("toks")).as("n"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).length == r.getInt(2))
    }
    assert(rows(0).getSeq[String](1) ==
      Seq("value", "window", "s", "x", "y", "z"))
    assert(rows(1).getSeq[String](1) == Seq("spark", "query"))
  }

  test("lossless partition: subword concatenation reproduces every word") {
    // merges only concatenate adjacent symbols, so for ANY input —
    // in-vocab, out-of-vocab, unicode, punctuation — the encoded
    // symbols must partition the word exactly
    val rng = new scala.util.Random(11)
    val alphabets = Seq("abcdefghijklmnopqrstuvwxyz", "aeiou", "ab",
                        "xq0189!-", "αβγδ")
    for (_ <- 1 to 500) {
      val alpha = alphabets(rng.nextInt(alphabets.size))
      val w = Seq.fill(1 + rng.nextInt(24))(
        alpha(rng.nextInt(alpha.length))).mkString
      val enc = Bpe.encodeWord(w)
      assert(enc.mkString == w, s"'$w' -> $enc")
      assert(enc.forall(_.nonEmpty))
    }
  }

  test("bounds: n_ws <= n_bpe <= n_chars per doc") {
    TextAnalysis.qTokenBpe(spark, TestSpark.sf0001).collect().foreach { r =>
      assert(r.getInt(1) <= r.getInt(2), s"doc ${r.getLong(0)}: ws > bpe")
    }
  }

  test("packChunks budgets in BPE token space when given the BPE counter") {
    Bpe.register(spark)
    val docToks = Tables.docTokens(spark, TestSpark.sf0001)
    val packed = Curation.packChunks(docToks, budget = 512,
        tokenCount = Bpe.bpeCount(col("toks")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // offsets are the BPE-count prefix sum and chunk = offset div budget
    var run = 0L
    packed.foreach { case (_, n, off, chunk) =>
      assert(off == run, "offset must be the running BPE token sum")
      assert(chunk == off / 512)
      run += n
    }
    // and the per-doc counts really are the BPE counts, not whitespace
    val bpe = TextAnalysis.qTokenBpe(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    packed.foreach { case (id, n, _, _) => assert(n == bpe(id)) }
  }
}
