package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the native Jaro–Winkler expression, Gini concentration,
  * key-skew profiling, and the two-proportion A/B test. */
class StringSimStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JaroWinkler matches the textbook values (and DuckDB's implementation)") {
    import graft.functions.JaroWinklerImpl.{jaro, similarity => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(math.abs(jaro("MARTHA", "MARHTA") - 0.9444444444444445) < 1e-15)
    assert(math.abs(jw(u("MARTHA"), u("MARHTA")) - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw(u("DIXON"), u("DICKSONX")) - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw(u("DWAYNE"), u("DUANE")) - 0.8400000000000001) < 1e-15)
    assert(jw(u("abc"), u("abc")) == 1.0)
    assert(jw(u(""), u("abc")) == 0.0 && jw(u(""), u("")) == 0.0)
    // below the 0.7 boost threshold the prefix must NOT boost
    assert(jw(u("ABCDE"), u("ABXXXXXXXX")) == jaro("ABCDE", "ABXXXXXXXX"))
  }

  test("JaroWinkler codegen path equals the interpreted path") {
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("a", "b"))
      .toDF("x", "y")
      .select(graft.functions.StringSimilarity.jaroWinkler(col("x"), col("y")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(0.9611111111111111, 0.8133333333333332, 0.0))
  }

  test("gini: closed forms — perfect equality 0-ish, total concentration → 1") {
    // equal values: G = 2*(n+1)/2/n - (n+1)/n = 0 exactly via the rank formula
    val eq = (1 to 4).map(i => ("g", s"u$i", 10.0)).toDF("grp", "id", "v")
    val g1 = ops.Profile.gini(eq, "grp", "id", "v").collect().head
    assert(g1.getDouble(3) == 0.0)
    // one entity holds everything: G = 2*n*S/(n*S) - (n+1)/n = (n-1)/n
    val conc = (("g", "u1", 100.0) +: (2 to 4).map(i => ("g", s"u$i", 0.0)))
      .toDF("grp", "id", "v")
    val g2 = ops.Profile.gini(conc, "grp", "id", "v").collect().head
    assert(g2.getDouble(3) == 0.75)
  }

  test("keySkew: uniform vs constant key distributions") {
    val df = (1 to 100).map(i => (i.toLong, 1L)).toDF("uniq", "const")
    val r = Graft.keySkew(df, Seq("uniq", "const")).collect()
      .map(x => x.getString(0) -> x).toMap
    val u = r("uniq"); val c = r("const")
    assert(u.getLong(2) == 100L && u.getDouble(3) == 0.01) // 100 keys, top1 1%
    assert(math.abs(u.getDouble(6) - 100.0) < 1e-4)        // eff_keys ≈ n
    assert(c.getLong(2) == 1L && c.getDouble(3) == 1.0)    // one key carries all
    assert(c.getDouble(5) == 0.0 && c.getDouble(6) == 1.0) // zero entropy
  }

  test("resolveEntities: typo cluster merges transitively, stranger stays alone") {
    val strs = Seq(
      (1L, "kitten"), (2L, "mitten"), (3L, "mittens"), // chain: 1-2, 2-3
      (5L, "zebra")
    ).toDF("id", "s")
    val r = ops.Fuzzy.resolveEntities(strs, "id", "s", minJw = 0.8)
      .collect().map(x => (x.getLong(0), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))
    // transitive closure: kitten~mitten~mittens one entity (canonical 1)
    assert(r.filter(_._1 <= 3).forall(x => x._2 == 1L && x._3 == 3L))
    assert(r.find(_._1 == 1L).get._4 && !r.find(_._1 == 2L).get._4)
    assert(r.find(_._1 == 5L).get == ((5L, 5L, 1L, true)))
  }

  test("resolveEntities: the JW threshold splits what levenshtein alone would merge") {
    // 'cat'~'cot' lev 1 but JW 0.777... < 0.9 → separate entities
    val strs = Seq((1L, "cat"), (2L, "cot")).toDF("id", "s")
    val r = ops.Fuzzy.resolveEntities(strs, "id", "s", minJw = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toMap
    assert(r == Map(1L -> 1L, 2L -> 2L))
  }

  test("targetEncode: rare category shrinks toward the prior") {
    val df = (Seq.fill(1000)(("common", 10.0)) :+ ("rare", 1000.0))
      .toDF("cat", "v")
    val r = Graft.targetEncode(df, "cat", "v", m = 100.0).collect()
      .map(x => x.getString(0) -> (x.getDouble(2), x.getDouble(4))).toMap
    val prior = (1000 * 10.0 + 1000.0) / 1001
    assert(math.abs(r("rare")._1 - 1000.0) < 1e-9)       // raw mean
    val exp = (1000.0 + 100 * prior) / (1 + 100)
    assert(math.abs(r("rare")._2 - exp) < 1e-4)           // shrunk hard
    assert(math.abs(r("common")._2 - 10.0) < 0.2)         // barely moves
  }

  test("psiDrift: identical distributions score ~0, a shifted one doesn't") {
    val ref = (1 to 1000).map(i => ("r", i.toDouble)).toDF("g", "v")
    val same = ops.Profile.psiDrift(ref, ref, "v").collect()
    assert(same.head.getDouble(same.head.fieldIndex("psi")) == 0.0)
    val shifted = (1 to 1000).map(i => ("c", i.toDouble + 500)).toDF("g", "v")
    val drift = ops.Profile.psiDrift(ref, shifted, "v").collect()
    assert(drift.head.getDouble(drift.head.fieldIndex("psi")) > 0.25)
    assert(drift.length == 10)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("histogram2d: cells land on floor edges with exact means") {
    val df = Seq((5.0, 0.01, 100.0), (15.0, 0.01, 200.0), (17.0, 0.01, 300.0))
      .toDF("x", "y", "m")
    val r = Graft.histogram2d(df, "x", 10.0, "y", 0.02, "m").collect()
      .map(c => (c.getLong(0), c.getLong(1)) -> (c.getLong(4), c.getDouble(5)))
      .toMap
    assert(r((0L, 0L)) == ((1L, 100.0)))
    assert(r((1L, 0L)) == ((2L, 250.0)))
  }

  test("burstiness: constant daily counts score Fano 0; a burst scores high") {
    val steady = (1 to 10).flatMap(d => (1 to 3).map(i =>
      (d.toLong * 10 + i, ts(f"2024-01-$d%02d 12:00:00"), "s", 1.0)))
    val bursty = (1 to 30).map(i =>
      (900L + i, ts("2024-01-05 12:00:00"), "b", 1.0)) ++
      Seq((999L, ts("2024-01-01 12:00:00"), "b", 1.0),
          (998L, ts("2024-01-10 12:00:00"), "b", 1.0))
    val r = ops.Profile.burstiness(
        (steady ++ bursty).toDF("event_id", "ts", "event_type", "value"))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("s") == 0.0)
    assert(r("b") > 10.0)
  }

  test("abTest: hand-computed z on a 2x2 and the degenerate guard") {
    // A: 4 users, 3 convert; B: 4 users, 1 converts
    val e = (1 to 8).map { i =>
      val conv = (i % 2 == 0 && i != 8) || i == 1 // users 2,4,6 (A), 1 (B)
      (i.toLong, ts("2024-01-01 10:00:00"),
       if (conv) "buy" else "view", 1.0, i.toLong)
    }.toDF("event_id", "ts", "event_type", "value", "user_id")
    val r = ops.Analytics.abTest(e,
      when(col("user_id") % 2 === 0, "A").otherwise("B"),
      col("event_type") === "buy").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 1L)
    val p = 0.5
    val z = (0.75 - 0.25) / math.sqrt(p * (1 - p) * (1.0 / 4 + 1.0 / 4))
    assert(math.abs(r.getDouble(6) - z) < 1e-6)
    assert(!r.getBoolean(7)) // |z| ≈ 1.41 < 1.96
    // degenerate: everyone converts → z = 0, no fault
    val all = ops.Analytics.abTest(e,
      when(col("user_id") % 2 === 0, "A").otherwise("B"), lit(true))
      .collect().head
    assert(all.getDouble(6) == 0.0)
  }
}
