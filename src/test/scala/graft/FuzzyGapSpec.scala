package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built-data specs for the r8 batch: fuzzy join (deletion
  * neighborhoods), gap fill, time-aware EWMA, categorical association. */
class FuzzyGapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- fuzzy join ----

  private def strs = Seq(
    (1L, "kitten"),   // sub vs 2, ed=1
    (2L, "mitten"),
    (3L, "mittens"),  // insert vs 2, ed=1; vs 1 ed=2
    (4L, "itten"),    // delete vs 1 and 2, ed=1
    (5L, "zebra"),    // isolated
    (6L, "kitten")    // exact dup of 1 — must NOT pair (distance 0)
  ).toDF("id", "s")

  private def pairSet(maxDist: Int, cap: Int = 0): Set[(Long, Long)] =
    ops.Fuzzy.fuzzyPairs(strs, "id", "s", maxDist, cap)
      .collect().map(r => (r.getLong(r.fieldIndex("id_a")),
                           r.getLong(r.fieldIndex("id_b")))).toSet

  test("fuzzyPairs: duplicate input rows do not duplicate output pairs") {
    // r9/r10 advice: a non-unique idCol (verbatim duplicate rows) must
    // not fan the join-back out — contract is ONE row per distinct
    // (id_a, id_b, value-pair)
    val dup = strs.union(Seq((1L, "kitten"), (2L, "mitten")).toDF("id", "s"))
    val rows = ops.Fuzzy.fuzzyPairs(dup, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getString(1),
                           r.getLong(2), r.getString(3)))
    assert(rows.length == rows.distinct.length, "duplicate pairs emitted")
    assert(rows.length == pairSet(1).size, "row count changed under input dup")
  }

  test("fuzzyPairs d=1: substitutions, insertions, deletions; no d=0, no d=2") {
    val p = pairSet(1)
    assert(p == Set((1L, 2L), (2L, 3L), (1L, 4L), (2L, 4L),
                    (2L, 6L), (4L, 6L)))
    // notable exclusions: (1,6) equal strings ed=0; (1,3) ed=2; zebra isolated
    assert(!p.contains((1L, 6L)) && !p.contains((1L, 3L)))
  }

  test("fuzzyPairs d=2 matches the naive definition on every pair") {
    val p = pairSet(2)
    val naive = strs.as("a").crossJoin(strs.as("b"))
      .filter($"a.id" < $"b.id" && levenshtein($"a.s", $"b.s").between(1, 2))
      .select($"a.id", $"b.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p == naive)
    assert(p.contains((1L, 3L))) // the distance-2 pair d=1 excluded
  }

  test("fuzzyPairs reports the exact distance") {
    val d = ops.Fuzzy.fuzzyPairs(strs, "id", "s", maxDist = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getInt(4))).toMap
    assert(d((1L, 2L)) == 1 && d((1L, 3L)) == 2)
  }

  test("fuzzyPairs maxSigGroup drops hot signatures but keeps cold pairs") {
    // 'kitten'/'mitten'/'itten' share the hot deletion variant 'itten';
    // capping at 2 removes signatures carried by >2 strings, but the
    // (2,3) pair survives on variants only those two share
    val p = pairSet(1, cap = 2)
    assert(p.contains((2L, 3L)))
    assert(p.subsetOf(pairSet(1)))
  }

  // ---- gap fill ----

  private def ts(s: String) = Timestamp.valueOf(s)
  private def evs = Seq(
    // type a: hours 0 and 3 observed, 1-2 missing
    (1L, ts("2024-01-01 00:10:00"), "a", 10.0),
    (2L, ts("2024-01-01 00:20:00"), "a", 2.0),
    (3L, ts("2024-01-01 03:30:00"), "a", 40.0),
    // type b: observed only at hour 1 — leading + trailing holes
    (4L, ts("2024-01-01 01:15:00"), "b", 7.5)
  ).toDF("event_id", "ts", "event_type", "value")

  test("gapFillHourly: spine, ffill, and linear interpolation") {
    val rows = Graft.gapFillHourly(evs).collect().map { r =>
      (r.getString(0), r.get(1).toString.substring(11, 13),
       r.getLong(2),
       Option(r.get(3)).map(_.asInstanceOf[Double]),
       Option(r.get(4)).map(_.asInstanceOf[Double]),
       Option(r.get(5)).map(_.asInstanceOf[Double]))
    }
    assert(rows.length == 8) // 2 types x 4 hourly slots
    val a = rows.filter(_._1 == "a").sortBy(_._2)
    // observed rows pass through
    assert(a(0) == (("a", "00", 2L, Some(12.0), Some(12.0), Some(12.0))))
    assert(a(3) == (("a", "03", 1L, Some(40.0), Some(40.0), Some(40.0))))
    // holes: ffill carries 12.0; lerp climbs 12 → 40 over 3 hours
    assert(a(1)._4.isEmpty && a(1)._5 == Some(12.0))
    assert(math.abs(a(1)._6.get - (12.0 + 28.0 / 3)) < 1e-6)
    assert(math.abs(a(2)._6.get - (12.0 + 56.0 / 3)) < 1e-6)
    val b = rows.filter(_._1 == "b").sortBy(_._2)
    // leading hole: no ffill, lerp backfills; trailing holes carry forward
    assert(b(0)._5.isEmpty && b(0)._6 == Some(7.5))
    assert(b(2) == (("b", "02", 0L, None, Some(7.5), Some(7.5))))
    assert(b(3) == (("b", "03", 0L, None, Some(7.5), Some(7.5))))
  }

  // ---- ewma ----

  test("ewmaDaily: calendar-gap decay at 0.5, exact arithmetic") {
    val e = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 4.0),
      (2L, ts("2024-01-02 00:00:00"), "a", 8.0),
      // day 3 missing — the gap decays day 2 by 1/4, day 1 by 1/8
      (3L, ts("2024-01-04 00:00:00"), "a", 2.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val r = Graft.ewmaDaily(e).collect()
      .map(x => (x.getDate(1).toString, x.getDouble(3))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("2024-01-01") == 4.0)
    assert(r("2024-01-02") == r6((8.0 + 0.5 * 4.0) / 1.5))
    assert(r("2024-01-04") == r6((2.0 + 0.25 * 8.0 + 0.125 * 4.0) / 1.375))
  }

  // ---- association ----

  test("assocStats: exact independence gives zero chi2/MI/V") {
    // 2x2 with perfectly proportional cells: (a1,b1)=10 (a1,b2)=30
    // (a2,b1)=20 (a2,b2)=60 — margins multiply out exactly
    val df = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(30)(("a1", "b2")) ++
              Seq.fill(20)(("a2", "b1")) ++ Seq.fill(60)(("a2", "b2")))
      .toDF("x", "y")
    val r = Graft.assocStats(df, "x", "y").collect()
    assert(r.length == 4)
    assert(r.forall(_.getDouble(r.head.fieldIndex("chi2_total")) == 0.0))
    assert(r.forall(_.getDouble(r.head.fieldIndex("mi_total")) == 0.0))
    assert(r.forall(_.getDouble(r.head.fieldIndex("cramers_v")) == 0.0))
  }

  test("assocStats: perfect dependence gives Cramér's V = 1") {
    val df = (Seq.fill(25)(("a1", "b1")) ++ Seq.fill(75)(("a2", "b2")))
      .toDF("x", "y")
    val r = Graft.assocStats(df, "x", "y").collect()
    val i = r.head.fieldIndex("cramers_v")
    assert(r.forall(_.getDouble(i) == 1.0))
    // chi2 of a perfectly dependent 2x2 equals N
    assert(r.forall(_.getDouble(r.head.fieldIndex("chi2_total")) == 100.0))
  }
}
