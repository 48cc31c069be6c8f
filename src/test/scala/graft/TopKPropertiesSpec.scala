package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKBuf

/** ScalaCheck properties of the native bounded top-k buffer
  * ([[graft.functions.TopKPairs]]'s hot path) against the obvious
  * sort-based reference — insertion order independence, merge ≡
  * single-buffer, distinct-mode dedup, serialization round-trip.
  * Pure JVM (no Spark), so hundreds of cases run in milliseconds. */
class TopKPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  // small domains force ties and exact duplicates
  private val pair = for {
    s <- Gen.choose(0, 9).map(_ / 4.0)
    id <- Gen.choose(0L, 12L)
  } yield (s, id)
  private val pairs = Gen.listOf(pair)
  private val kGen = Gen.choose(1, 5)

  /** Reference semantics: row_number over (score desc, id asc) <= k. */
  private def reference(xs: List[(Double, Long)], k: Int,
                        distinct: Boolean): List[(Double, Long)] = {
    val base = if (distinct) xs.distinct else xs
    base.sortBy { case (s, i) => (-s, i) }.take(k)
  }

  private def drain(b: TopKBuf): List[(Double, Long)] =
    (0 until b.n).map(j => (b.scores(j), b.ids(j))).toList

  test("insert stream == sort-take reference (with and without distinct)") {
    check(Prop.forAll(pairs, kGen, Gen.oneOf(true, false)) { (xs, k, distinct) =>
      val b = new TopKBuf(k)
      xs.foreach { case (s, i) => b.insert(s, i, distinct) }
      drain(b) == reference(xs, k, distinct)
    })
  }

  test("merge of split halves == single buffer over the whole stream") {
    check(Prop.forAll(pairs, pairs, kGen, Gen.oneOf(true, false)) { (xs, ys, k, distinct) =>
      val a = new TopKBuf(k)
      xs.foreach { case (s, i) => a.insert(s, i, distinct) }
      val b = new TopKBuf(k)
      ys.foreach { case (s, i) => b.insert(s, i, distinct) }
      a.mergeFrom(b, distinct)
      drain(a) == reference(xs ++ ys, k, distinct)
    })
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    check(Prop.forAll(pairs, kGen) { (xs, k) =>
      val agg = graft.functions.TopKPairs(null, null, k, distinct = false)
      val b = new TopKBuf(k)
      xs.foreach { case (s, i) => b.insert(s, i, false) }
      drain(agg.deserialize(agg.serialize(b))) == drain(b)
    })
  }
}
