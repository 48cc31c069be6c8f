package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Specs for interval union, join-cardinality prediction, and
  * quantile binning. */
class IntervalCardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervalUnion: overlap merges, gap splits, containment absorbs") {
    val iv = Seq(
      // key a: [0,10] + [5,15] overlap → [0,15]; [20,25] separate
      ("a", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      ("a", ts("2024-01-01 00:05:00"), ts("2024-01-01 00:15:00")),
      ("a", ts("2024-01-01 00:20:00"), ts("2024-01-01 00:25:00")),
      // key b: [0,30] contains [5,10] → one island of 30
      ("b", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      ("b", ts("2024-01-01 00:05:00"), ts("2024-01-01 00:10:00"))
    ).toDF("key", "s", "e")
    val r = ops.Relational.intervalUnion(iv).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("a") == ((2L, 20L * 60 * 1000000)))
    assert(r("b") == ((1L, 30L * 60 * 1000000)))
  }

  test("intervalUnion: touching intervals merge (start == running max end)") {
    val iv = Seq(("k", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
                 ("k", ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")))
      .toDF("key", "s", "e")
    val r = ops.Relational.intervalUnion(iv).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 20L * 60 * 1000000)
  }

  test("rollingActives: WAU unions the trailing week's distinct users") {
    // u1 active day 1; u2 active days 1 and 9; u3 active day 3
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "x", 1.0, 1L),
      (2L, ts("2024-01-01 11:00:00"), "x", 1.0, 2L),
      (3L, ts("2024-01-03 10:00:00"), "x", 1.0, 3L),
      (4L, ts("2024-01-09 10:00:00"), "x", 1.0, 2L),
      (5L, ts("2024-01-09 12:00:00"), "x", 1.0, 2L) // same user-day: no double count
    ).toDF("event_id", "ts", "event_type", "value", "user_id")
    val r = Graft.rollingActives(e, window = 7).collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("2024-01-01") == ((2L, 2L)))
    assert(r("2024-01-03") == ((1L, 3L))) // u1+u2 (day1) + u3
    assert(r("2024-01-07") == ((0L, 3L))) // day1+day3 still in window
    assert(r("2024-01-08") == ((0L, 1L))) // day1 aged out; u3 remains
    assert(r("2024-01-09") == ((1L, 2L))) // u3 (day3) + u2 returning
    assert(!r.contains("2024-01-10"))     // past the observed span
  }

  test("joinCardinality: prediction equals the actual join size exactly") {
    val l = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("k", "p")
    val r = Seq((1L, "a"), (1L, "b"), (1L, "c"), (3L, "d"), (9L, "e"))
      .toDF("k2", "q")
    val row = Graft.joinCardinality(l, "k", r, "k2").collect().head
    // key 1: 2*3=6, key 3: 1*1=1 → predicted 7; max contrib 6
    assert(row.getLong(row.fieldIndex("predicted_rows")) == 7L)
    assert(row.getLong(row.fieldIndex("actual_rows")) == 7L)
    assert(row.getLong(row.fieldIndex("max_key_contrib")) == 6L)
    assert(row.getLong(row.fieldIndex("overlap_keys")) == 2L)
    assert(row.getLong(row.fieldIndex("n_left")) == 4L
      && row.getLong(row.fieldIndex("keys_right")) == 3L)
  }

  test("quantileBins: deciles of a uniform ramp carry ~equal counts, monotone target") {
    val df = (1 to 1000).map(i => (i.toDouble, i * 2.0)).toDF("v", "t")
    val bins = Graft.quantileBins(df, "v", "t").collect()
    assert(bins.length == 10)
    assert(bins.map(_.getLong(1)).sum == 1000L)
    // equi-depth: every bin within 1 of 100
    assert(bins.forall(b => math.abs(b.getLong(1) - 100L) <= 1))
    // target mean strictly increases across bins for t = 2v
    val means = bins.map(_.getDouble(4))
    assert(means.zip(means.tail).forall { case (a, b) => a < b })
  }
}
