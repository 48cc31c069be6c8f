package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAggregator

/** ScalaCheck properties of the round-6 sketch/layout primitives —
  * pure JVM, no Spark session, hundreds of cases in milliseconds.
  *
  *  - Misra–Gries: the N/(k+1) survival + undercount guarantees hold
  *    for ARBITRARY streams under ARBITRARY partition/merge trees
  *    (Spark may split partials anywhere and merge in any order) —
  *    the property the exact two-pass heavy hitters rely on.
  *  - Morton interleave: a bijection on 16-bit pairs (the inverse
  *    de-interleave recovers both coordinates), so Z-ordering never
  *    collides two distinct (a, b) cells — the premise of the
  *    bounded-rectangle file-skipping argument.
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  // small token domain forces heavy collisions and real decrements
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const("hot"),
      3 -> Gen.choose(0, 40).map(i => s"w$i"),
      1 -> Gen.choose(0, 2000).map(i => s"rare$i")))
  private val kGen = Gen.choose(1, 8)

  /** Fold a stream through the aggregator across arbitrary cuts,
    * merging left-to-right like one of Spark's possible merge trees. */
  private def sketchWithCuts(agg: MisraGriesAggregator, xs: List[String],
                             cuts: List[Int]): Map[String, Long] = {
    val bounds = (0 :: cuts.map(c => if (xs.isEmpty) 0 else math.abs(c) % (xs.size + 1)))
      .sorted :+ xs.size
    val parts = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    parts.map(p => p.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
  }

  test("MG: every item above N/(k+1) survives any partition/merge split") {
    check(Prop.forAll(streamGen, kGen, Gen.listOfN(3, Gen.choose(0, 10000))) {
      (xs, k, cuts) =>
        val agg = new MisraGriesAggregator(k)
        val sketch = sketchWithCuts(agg, xs, cuts)
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
        val thr = xs.size.toDouble / (k + 1)
        val heavy = exact.filter(_._2 > thr).keys
        Prop.all(
          (sketch.size <= k) :| "size bound",
          Prop.all(heavy.map(h =>
            sketch.contains(h) :| s"heavy '$h' evicted").toSeq: _*))
    })
  }

  test("MG: counters never overcount and undercount by at most N/(k+1)") {
    check(Prop.forAll(streamGen, kGen, Gen.listOfN(2, Gen.choose(0, 10000))) {
      (xs, k, cuts) =>
        val agg = new MisraGriesAggregator(k)
        val sketch = sketchWithCuts(agg, xs, cuts)
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val slack = xs.size.toDouble / (k + 1)
        Prop.all(sketch.toSeq.map { case (s, c) =>
          val f = exact.getOrElse(s, 0L)
          ((c <= f) && (f - c) <= slack) :| s"'$s' est=$c exact=$f slack=$slack"
        }: _*)
    })
  }

  test("MG: merge is commutative on the kept-key set's guarantee (both orders keep all heavy items)") {
    check(Prop.forAll(streamGen, streamGen, kGen) { (a, b, k) =>
      val agg = new MisraGriesAggregator(k)
      val sa = a.foldLeft(agg.zero)(agg.reduce)
      val sb = b.foldLeft(agg.zero)(agg.reduce)
      val xs = a ++ b
      val thr = xs.size.toDouble / (k + 1)
      val heavy = xs.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 > thr).keys.toSeq
      val m1 = agg.merge(sa, sb)
      val m2 = agg.merge(sb, sa)
      Prop.all(heavy.map(h =>
        (m1.contains(h) && m2.contains(h)) :| s"'$h' lost in a merge order").toSeq: _*)
    })
  }

  test("Morton interleave is a bijection on 16-bit pairs, and the Column form agrees") {
    // plain-Scala model of the bit algebra; the last block ties it to
    // the actual Column expression through a Spark evaluation
    def spread(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
    def compact(z: Long): Long = {
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0xFFFFL
    }
    val c16 = Gen.choose(0L, 65535L)
    check(Prop.forAll(c16, c16) { (a, b) =>
      val z = morton(a, b)
      (compact(z) == a && compact(z >> 1) == b) :| s"roundtrip failed for ($a, $b) -> $z"
    })
    // and distinct pairs never collide (implied by the inverse, spot-check anyway)
    check(Prop.forAll(c16, c16, c16, c16) { (a, b, c, d) =>
      (a == c && b == d) || morton(a, b) != morton(c, d)
    })
    // the Column expression computes the same codes as the model
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions.col
    val sample = (0 until 500).map(i => ((i * 131L) % 65536, (i * 977L) % 65536))
    val got = sample.toDF("a", "b")
      .select(col("a"), col("b"),
              graft.sources.Formats.mortonCode(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (a, b, z) => z == morton(a, b) })
  }
}
