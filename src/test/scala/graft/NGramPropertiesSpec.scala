package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** ScalaCheck properties of the n-gram algebra (SURVEY.md §5.2.3) —
  * checked on the plain-Scala form, which NGramSpec ties to both the
  * expression and ml.Pipeline forms. (ScalaCheck is driven directly —
  * the scalatest-plus bridge is not on the classpath.) */
class NGramPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokens = Gen.listOf(token)
  private val smallN = Gen.choose(1, 6)

  test("length law: |ngrams(t, n)| == max(0, |t| - n + 1)") {
    check(Prop.forAll(tokens, smallN) { (t, n) =>
      Text.ngramsScala(t, n).length == math.max(0, t.length - n + 1)
    })
  }

  test("content law: ngrams(t, n)(i) == t.slice(i, i+n).mkString(\" \")") {
    check(Prop.forAll(tokens, smallN) { (t, n) =>
      Text.ngramsScala(t, n).zipWithIndex.forall { case (g, i) =>
        g == t.slice(i, i + n).mkString(" ")
      }
    })
  }

  test("identity law: ngrams(t, 1) == t") {
    check(Prop.forAll(tokens) { t => Text.ngramsScala(t, 1) == t })
  }

  test("tokenize/join roundtrip: split(join(t)) == t for nonempty tokens") {
    check(Prop.forAll(Gen.nonEmptyListOf(token)) { t =>
      t.mkString(" ").split("\\s+").toSeq == t
    })
  }

  test("jaccard bounds and symmetry") {
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0
      else (a & b).size.toDouble / (a | b).size
    check(Prop.forAll(tokens, tokens) { (x, y) =>
      val (a, b) = (x.toSet, y.toSet)
      val j = jac(a, b)
      j >= 0.0 && j <= 1.0 && j == jac(b, a) && (a != b || j == 1.0)
    })
  }
}
