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

}
