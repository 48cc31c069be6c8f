package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Goldens for the exact covariance matrix and the power-iteration PCA
  * projection — planted structure with closed-form expectations, no
  * reference solver. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 64-dim float32 embeddings along a planted axis: vec i =
    * a_i · u + b_i · w with u = e0, w = e1 and |a| spread ≫ |b|
    * spread, all coordinates exact multiples of 2^-10 (well inside
    * the 2^-50 carrier guard). */
  private def planted(n: Int = 64): org.apache.spark.sql.DataFrame = {
    (0 until n).map { i =>
      val a = (i % 17).toFloat / 4f - 2f     // dominant spread on dim 0
      val b = (i % 5).toFloat / 16f          // minor spread on dim 1
      val v = new Array[Float](64)
      v(0) = a; v(1) = b
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("covMatrix: hand-computed 2-active-dim covariance, zeros elsewhere") {
    val df = planted()
    val cov = Similarity.covMatrix(df).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    assert(cov.size == 64 * 65 / 2)
    val as = (0 until 64).map(i => ((i % 17).toDouble / 4 - 2))
    val bs = (0 until 64).map(i => (i % 5).toDouble / 16)
    def cv(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size
      math.rint((x.zip(y).map { case (p, q) => p * q }.sum / n
        - x.sum / n * (y.sum / n)) * 1e6) / 1e6
    }
    assert(math.abs(cov((0, 0)) - cv(as, as)) <= 1e-6)
    assert(math.abs(cov((1, 1)) - cv(bs, bs)) <= 1e-6)
    assert(math.abs(cov((0, 1)) - cv(as, bs)) <= 1e-6)
    // every dim not planted is exactly zero — integer carriers, no
    // accumulated noise
    assert(cov((2, 2)) == 0.0 && cov((0, 63)) == 0.0 && cov((5, 9)) == 0.0)
  }

  test("CovAggregator merge: carry renormalizes low chunks; overflow throws, never wraps") {
    import graft.functions.{CovAggregator, CovBuf}
    val agg = new CovAggregator(1)
    val big = 1L << 33 // half the 2^34 chunk radix
    val a = CovBuf(Array(0L), Array(big), Array(0L), Array(big), Array(big), 1L)
    val b = CovBuf(Array(0L), Array(big), Array(0L), Array(big), Array(big), 1L)
    val m = agg.merge(a, b)
    // xc: 2^34 carries up whole — xa gains 1, xc back to 0
    assert(m.xa(0) == 1L && m.xc(0) == 0L)
    // pc: 2^34 carries into pb (2^34 + 1), which carries into pa
    assert(m.pc(0) == 0L && m.pb(0) == 1L && m.pa(0) == 1L)
    assert(m.n == 2L)
    // r11 advice: corpus-wide top-chunk overflow must THROW (a silent
    // wrap would be a wrong covariance with no error)
    val c = CovBuf(Array(0L), Array(0L), Array(Long.MaxValue), Array(0L), Array(0L), 1L)
    val d = CovBuf(Array(0L), Array(0L), Array(1L), Array(0L), Array(0L), 1L)
    intercept[ArithmeticException](agg.merge(c, d))
  }

  test("pcaProject: recovers the planted dominant axis; pc2 the minor one") {
    val df = planted()
    val out = Similarity.pcaProject(df, k = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val as = (0 until 64).map(i => ((i % 17).toDouble / 4 - 2))
    val bs = (0 until 64).map(i => (i % 5).toDouble / 16)
    // planted cross-covariance cov(a,b) is ~0 but not exactly 0, so
    // the principal axes are u, w up to a tiny rotation: projections
    // must correlate ≈1 with the planted coordinates
    def corr(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size
      val (mx, my) = (x.sum / n, y.sum / n)
      val cxy = x.zip(y).map { case (p, q) => (p - mx) * (q - my) }.sum
      val sx = math.sqrt(x.map(p => (p - mx) * (p - mx)).sum)
      val sy = math.sqrt(y.map(q => (q - my) * (q - my)).sum)
      cxy / (sx * sy)
    }
    val pc1 = out.map(_._2).toSeq
    val pc2 = out.map(_._3).toSeq
    assert(math.abs(corr(pc1, as)) > 0.999, s"pc1 vs planted a: ${corr(pc1, as)}")
    assert(math.abs(corr(pc2, bs)) > 0.999, s"pc2 vs planted b: ${corr(pc2, bs)}")
    // sign canon: pc1's loading pivot is positive -> pc1 correlates
    // POSITIVELY with the dominant planted coordinate
    assert(corr(pc1, as) > 0)
    // variance ordering: var(pc1) >= var(pc2)
    def va(x: Seq[Double]) = { val m = x.sum / x.size; x.map(p => (p - m) * (p - m)).sum }
    assert(va(pc1) >= va(pc2))
  }

  test("pcaProject: start orthogonal to the dominant axis still recovers it") {
    // r11 review regression: variance ONLY along u = (e0 − e1)/√2 —
    // the all-ones start is exactly orthogonal to u (cov·1 = 0), so a
    // stuck iteration would return a zero-variance pc1; the start
    // cascade must fall through to a basis vector and recover u
    val df = (0 until 32).map { i =>
      val a = (i % 9).toFloat / 4f - 1f
      val v = new Array[Float](64)
      v(0) = a; v(1) = -a
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.pcaProject(df, k = 1).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val as = (0 until 32).map(i => ((i % 9).toDouble / 4 - 1))
    // pc1 must carry the planted variance, not collapse to a constant
    val pc1 = out.map(_._2)
    assert(pc1.distinct.length > 1, s"pc1 collapsed: ${pc1.take(4).toSeq}")
    // and must be exactly proportional to the planted coordinate
    val pairs = out.map(_._1.toInt).map(as).zip(pc1)
    val scale = pairs.collectFirst { case (a, p) if a != 0 => p / a }.get
    assert(pairs.forall { case (a, p) => math.abs(p - a * scale) < 1e-5 })
  }

  test("pcaProject: start stuck EXACTLY on a minor eigenvector loses to max-Rayleigh") {
    // r11 advice regression: dominant axis u = (e0 − e1)/√2, minor
    // axis w = (e0 + e1)/√2 with NONZERO variance. The uniform start
    // lies exactly on w; FP symmetry (m01 = m10, m00 = m11, and
    // fl(a+b) = fl(b+a)) keeps every iterate's u-component exactly
    // zero, so the old escapes-the-null-space check passed (‖M·x‖ > 0)
    // while the iteration never left the MINOR axis — returning it as
    // pc1 and inverting the eigenvalue order. Max-Rayleigh over the
    // cascade must pick a basis start that reaches u instead.
    val grid = for (a <- Seq(-2f, -1f, 1f, 2f); b <- Seq(-0.25f, 0.25f))
      yield (a, b)
    val df = grid.zipWithIndex.map { case ((a, b), i) =>
      val v = new Array[Float](64)
      v(0) = a + b; v(1) = -a + b
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.pcaProject(df, k = 2).collect()
      .map(r => (r.getLong(0).toInt, r.getDouble(1), r.getDouble(2)))
    // var along u is 2·var(a) = 5.0, along w is 2·var(b) = 0.125:
    // pc1 must carry the DOMINANT spread (∝ a), pc2 the minor (∝ b)
    def va(x: Seq[Double]) = { val m = x.sum / x.size; x.map(p => (p - m) * (p - m)).sum / x.size }
    val pc1 = out.sortBy(_._1).map(_._2).toSeq
    val pc2 = out.sortBy(_._1).map(_._3).toSeq
    assert(math.abs(va(pc1) - 5.0) < 1e-4, s"var(pc1) = ${va(pc1)} — minor axis won")
    assert(math.abs(va(pc2) - 0.125) < 1e-4, s"var(pc2) = ${va(pc2)}")
    val as = grid.map(_._1.toDouble)
    val scale = pc1.zip(as).collectFirst { case (p, a) if a != 0 => p / a }.get
    assert(pc1.zip(as).forall { case (p, a) => math.abs(p - a * scale) < 1e-4 })
  }

  test("pcaProject is deterministic across runs") {
    val df = planted()
    val a = Similarity.pcaProject(df, k = 2).collect().toSeq
    val b = Similarity.pcaProject(df, k = 2).collect().toSeq
    assert(a == b)
  }

  test("pcaProject on the fixture corpus: finite, ordered, n rows") {
    val out = Similarity.qEmbedPca(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 0)
    assert(rows.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN))
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }
}
