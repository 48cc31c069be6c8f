package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusLaws, Graph}

/** Zipf/Heaps law fits and the two new link-structure readouts
  * (reciprocity, degree assortativity) on hand-computed fixtures. */
class CorpusLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zipfFit recovers slope -1 exactly on a perfect Zipf corpus") {
    // counts 12, 6, 4, 3 = 12/rank: ln f = ln 12 - 1·ln rank exactly
    val toks = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).toDF("w")
    val r = CorpusLaws.zipfFit(toks).collect()(0)
    assert(r.getAs[Long]("n_types") == 4L)
    assert(r.getAs[Long]("n_tokens") == 25L)
    assert(r.getAs[Long]("n_ranks") == 4L)
    assert(math.abs(r.getAs[Double]("slope") - -1.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-4)
    assert(r.getAs[Double]("r2") > 0.999999)
  }

  test("zipfFit: single-type corpus fits the degenerate flat line") {
    // one rank: zero x-variance -> slope 0, r2 0, intercept = ln f
    val r = CorpusLaws.zipfFit(Seq.fill(7)("only").toDF("w")).collect()(0)
    assert(r.getAs[Double]("slope") == 0.0)
    assert(r.getAs[Double]("r2") == 0.0)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(7.0)) < 1e-4)
  }

  private def doc(id: Long, src: String, toks: Seq[String]) =
    toks.map(w => (id, src, w))

  test("heapsFit recovers beta 0.5 / k 1 on exact sqrt vocabulary growth") {
    // (toks, types) = (4,2), (16,4), (64,8): ln types = 0.5·ln toks
    val rows =
      doc(1, "s", Seq.fill(2)("a") ++ Seq.fill(2)("b")) ++
      doc(2, "s", Seq("a", "b", "c", "d").flatMap(Seq.fill(4)(_))) ++
      doc(3, "s", ('a' to 'h').map(_.toString).flatMap(Seq.fill(8)(_)))
    val r = CorpusLaws.heapsFit(rows.toDF("doc_id", "source", "w")).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_docs") == 3L)
    assert(math.abs(r(0).getAs[Double]("beta") - 0.5) < 1e-4)
    assert(math.abs(r(0).getAs[Double]("k") - 1.0) < 1e-4)
    assert(r(0).getAs[Double]("r2") > 0.999999)
  }

  test("heapsFit: template source (constant vocabulary) fits beta 0, k = vocab") {
    // every doc reuses the same 2 types regardless of length
    val rows =
      doc(1, "t", Seq.fill(2)("x") ++ Seq.fill(2)("y")) ++
      doc(2, "t", Seq.fill(8)("x") ++ Seq.fill(8)("y")) ++
      doc(3, "t", Seq.fill(32)("x") ++ Seq.fill(32)("y"))
    val r = CorpusLaws.heapsFit(rows.toDF("doc_id", "source", "w")).collect()(0)
    assert(r.getAs[Double]("beta") == 0.0)
    assert(math.abs(r.getAs[Double]("k") - 2.0) < 1e-4)
    assert(r.getAs[Double]("r2") == 0.0)
  }

  test("reciprocity: mutual pair is 1.0, one-way extra edge halves the ratio") {
    // a↔b mutual; a→c unreciprocated; c has no out-edges -> no row
    val edges = Seq("a" -> "b", "b" -> "a", "a" -> "c").toDF("src", "dst")
    val m = Graph.reciprocity(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m("a") == ((2L, 1L, 0.5)))
    assert(m("b") == ((1L, 1L, 1.0)))
    assert(!m.contains("c"))
  }

  test("reciprocity ignores self-loops and duplicate edges") {
    val edges = Seq("a" -> "a", "a" -> "b", "a" -> "b", "b" -> "a")
      .toDF("src", "dst")
    val m = Graph.reciprocity(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(m("a") == ((1L, 1.0)) && m("b") == ((1L, 1.0)))
  }

  test("assortativity: out-hub star is disassortative in the out-in mode") {
    // a→b, a→c, a→d, b→c: hand-computed r(out_in) = -1/sqrt(3),
    // r(in_out) = -1/3 (see the sums in the scaladoc discipline)
    val edges = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c")
      .toDF("src", "dst")
    val m = Graph.assortativity(edges).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m.keySet == Set("in_in", "in_out", "out_in", "out_out"))
    assert(m.values.forall(_._1 == 4L))
    assert(math.abs(m("out_in")._2 - -1.0 / math.sqrt(3.0)) < 1e-6)
    assert(math.abs(m("in_out")._2 - -1.0 / 3.0) < 1e-6)
  }

  test("assortativity: constant degrees report 0, not NaN") {
    // directed 3-cycle: every degree is 1 -> zero variance everywhere
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val rows = Graph.assortativity(edges).collect()
    assert(rows.length == 4 && rows.forall(_.getDouble(2) == 0.0))
  }
}
