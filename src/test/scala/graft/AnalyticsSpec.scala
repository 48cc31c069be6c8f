package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Hand-built-data specs for RFM, market basket, and CUSUM. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rfm: scores follow the quintile ordering with 5 = best") {
    // 5 users, one purchase each on days 1..5 with values 10..50:
    // user u5 bought last (recency 0 → r=5) and most (m=5)
    val e = (1 to 5).map { i =>
      (i.toLong, ts(f"2024-01-0$i 10:00:00"), "purchase", i * 10.0, s"u$i")
    }.map { case (id, t, et, v, u) => (id, t, et, v, u) }
      .toDF("event_id", "ts", "event_type", "value", "user_id")
    val r = ops.Analytics.rfm(e).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getInt(4), x.getInt(6),
        x.getString(7))).toMap
    assert(r("u5") == ((0L, 5, 5, "555")))
    assert(r("u1") == ((4L, 1, 1, "111")))
  }

  test("rfm: only the purchase type counts") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase", 10.0, "u1"),
      (2L, ts("2024-01-02 10:00:00"), "view", 99.0, "u2")
    ).toDF("event_id", "ts", "event_type", "value", "user_id")
    val users = ops.Analytics.rfm(e).collect().map(_.getString(0)).toSet
    assert(users == Set("u1"))
  }

  test("marketBasket: closed-form support, confidence, lift") {
    // 4 baskets (same user, 4 days): {a,b}, {a,b}, {a}, {b}
    // n_a=3, n_b=3, n_ab=2, N=4 → supp=0.5, conf both 2/3, lift = 8/9
    val rows = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a", 1.0, "u"),
      (2L, ts("2024-01-01 10:00:00"), "b", 1.0, "u"),
      (3L, ts("2024-01-02 09:00:00"), "a", 1.0, "u"),
      (4L, ts("2024-01-02 10:00:00"), "b", 1.0, "u"),
      (5L, ts("2024-01-03 09:00:00"), "a", 1.0, "u"),
      (6L, ts("2024-01-04 09:00:00"), "b", 1.0, "u")
    ).toDF("event_id", "ts", "event_type", "value", "user_id")
    val r = ops.Analytics.marketBasket(rows).collect()
    assert(r.length == 1)
    val x = r.head
    assert(x.getString(0) == "a" && x.getString(1) == "b")
    assert(x.getLong(2) == 2L && x.getLong(3) == 3L && x.getLong(4) == 3L)
    assert(x.getDouble(6) == 0.5)
    assert(x.getDouble(7) == 0.666667 && x.getDouble(8) == 0.666667)
    assert(x.getDouble(9) == 0.888889)
  }

  test("cusum: a sustained level shift alarms; the steady prefix does not") {
    // 20 days at 5 events, then 10 days at 9: the shift accumulates
    // past h=5 within a few days; no alarm before the shift
    val steady = for (d <- 1 to 20; i <- 1 to 5)
      yield (d.toLong * 100 + i, ts(f"2024-01-$d%02d 12:00:00"), "a", 1.0, "u")
    val shifted = for (d <- 21 to 30; i <- 1 to 9)
      yield (d.toLong * 100 + i, ts(f"2024-01-$d%02d 12:00:00"), "a", 1.0, "u")
    val out = ops.Analytics.cusum((steady ++ shifted)
        .toDF("event_id", "ts", "event_type", "value", "user_id"))
      .collect().map(r => (r.getDate(1).toString, r.getBoolean(6)))
    assert(out.takeWhile(_._1 < "2024-01-21").forall(!_._2))
    assert(out.exists { case (d, a) => a && d >= "2024-01-23" })
  }

  test("cusum: zero-variance series stays silent (sd guard)") {
    val e = (1 to 5).map(d => (d.toLong, ts(f"2024-01-0$d 12:00:00"), "b", 1.0, "u"))
      .toDF("event_id", "ts", "event_type", "value", "user_id")
    val out = ops.Analytics.cusum(e).collect()
    assert(out.forall(r => !r.getBoolean(6) && !r.getDouble(4).isNaN))
  }
}
