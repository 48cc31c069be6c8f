package graft

import org.scalatest.funsuite.AnyFunSuite

/** Distributed-vs-reference cross-checks for the r5 text/dedup
  * operators: the Spark pipelines must agree with a plain-Scala
  * single-node implementation of the same definition on seeded random
  * corpora — the strongest correctness evidence available beyond the
  * DuckDB oracle (and independent of it). */
class TextOpsPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val vocab = Vector("a", "b", "c", "dd", "ee", "fff", "gg", "hh")
  private def randDocs(n: Int, minLen: Int = 3, maxLen: Int = 40) =
    (0 until n).map { i =>
      val len = minLen + rng.nextInt(maxLen - minLen)
      (i.toLong, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }

  test("tokenEntropy == single-node Shannon entropy on random corpora") {
    val docs = randDocs(40)
    val got = Graft.tokenEntropy(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").toSeq
      val n = toks.size.toDouble
      val h = -toks.groupBy(identity).values
        .map(g => g.size / n * math.log(g.size / n)).sum
      assert(math.abs(got(id) - BigDecimal(h).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6,
        s"doc $id: ${got(id)} vs $h")
    }
  }

  test("perplexity == single-node unigram NLL on random corpora") {
    val docs = randDocs(40)
    val counts = docs.flatMap(_._2.split("\\s+")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toDouble }
    val total = counts.values.sum
    val got = Graft.perplexity(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").toSeq
      val nll = -toks.map(w => math.log(counts(w) / total)).sum / toks.size
      assert(math.abs(got(id) - nll) < 2e-6, s"doc $id: ${got(id)} vs $nll")
    }
  }

  test("sharedSpans == single-node window-set intersection on random corpora") {
    val w = 5
    val docs = randDocs(25, minLen = 4, maxLen = 20)
    def spans(text: String): Set[Seq[String]] =
      text.split("\\s+").toSeq.sliding(w).filter(_.size == w).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      shared = spans(ta).intersect(spans(tb)) if shared.nonEmpty
    } yield (ia, ib) -> shared.size.toLong).toMap
    val got = Graft.sharedSpans(docs.toDF("doc_id", "text"), w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got ${got.size} pairs vs ${expected.size}")
  }

  // ----------------------------------------------------------------
  // Script-aware tokenization (r15): planted mixed-script goldens
  // ----------------------------------------------------------------

  private def scriptToks(texts: String*): Seq[Seq[String]] = {
    import org.apache.spark.sql.functions.col
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.Text.tokenizeScriptAware(col("text")).as("toks"))
      .orderBy("doc_id")
      .collect().toSeq.map(_.getSeq[String](1))
  }

  test("tokenizeScriptAware: planted mixed-script goldens (hand-computed)") {
    val Seq(mixed, pureCjk, singleChar, kana, hangul, latin, empty) = scriptToks(
      "Hello World 中文分词",  // latin words + one Han run
      "中文分词",               // pure CJK: bigrams only
      "a 中 b",                 // 1-char run ⇒ the char itself
      "日本語のテキスト",        // Han+kana contiguous: ONE run (class is unified)
      "한국어 텍스트",           // Hangul, space-separated runs
      "Plain English only.",    // no CJK: identical to the whitespace tokenizer
      "")
    assert(mixed == Seq("hello", "world", "中文", "文分", "分词"))
    assert(pureCjk == Seq("中文", "文分", "分词"))
    assert(singleChar == Seq("a", "b", "中"))
    assert(kana == Seq("日本", "本語", "語の", "のテ", "テキ", "キス", "スト"))
    assert(hangul == Seq("한국", "국어", "텍스", "스트"))
    assert(latin == Seq("plain", "english", "only."))
    assert(empty == Seq.empty)
  }

  test("tokenizeScriptAware composes with the MinHash/shingle stack: CJK near-dups collide, CJK non-dups don't") {
    import org.apache.spark.sql.functions.col
    // whitespace tokenization sees each of these as ONE token, so
    // shingles/minhash would treat the near-identical pair as wholly
    // distinct; char-bigram tokens restore real overlap
    val docs = Seq(
      (1L, "zh", "机器学习是人工智能的一个分支领域"),
      (2L, "zh", "机器学习是人工智能的重要分支领域"), // near-dup of 1
      (3L, "zh", "今天天气晴朗适合外出散步走走"))       // unrelated
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
              graft.ops.Text.tokenizeScriptAware(col("text")).as("toks"))
    val sims = graft.ops.Dedup.jaccardPairs(docs, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sims.exists { case (a, b, s) => a == 1L && b == 2L && s > 0.5 })
    assert(!sims.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("langId script tier: planted ja/ko/zh/latin docs predict by script, stopwords only within Latin") {
    import org.apache.spark.sql.functions.{col, lower, split, trim}
    val docs = Seq(
      (1L, "zh", "机器学习与数据处理"),
      (2L, "ja", "これは日本語のテキストです"),    // kana beats Han
      (3L, "ko", "한국어 텍스트 문서"),
      (4L, "en", "the cat sat on the mat and it is you that for"),
      (5L, "und", "xyzzy qwerty 12345"))
      .toDF("doc_id", "lang", "text")
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
    val pred = graft.ops.TextAnalysis.langId(docs)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(pred == Map(1L -> "zh", 2L -> "ja", 3L -> "ko",
                       4L -> "en", 5L -> "und"))
  }
}
