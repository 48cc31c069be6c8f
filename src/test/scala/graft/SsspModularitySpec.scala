package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built-data specs for weighted SSSP, modularity, rolling
  * quantiles, and the seasonal-profile anomaly detector. */
class SsspModularitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sssp: weighted relaxation beats the fewer-hop path") {
    // a->b cost 10 direct, but a->c->b costs 2+3=5; d unreachable
    val edges = Seq(("a", "b", 10L), ("a", "c", 2L), ("c", "b", 3L),
                    ("d", "e", 1L)).toDF("src", "dst", "cost")
    val seeds = Seq("a").toDF("node")
    val d = ops.Graph.sssp(edges, seeds)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d == Map("a" -> 0L, "b" -> 5L, "c" -> 2L,
                    "d" -> -1L, "e" -> -1L))
  }

  test("sssp: chain deeper than the round budget stays partial (declared fixed-round contract)") {
    val chain = (0 until 15).map(i => (s"n%02d".format(i), s"n%02d".format(i + 1), 1L))
      .toDF("src", "dst", "cost")
    val d = ops.Graph.sssp(chain, Seq("n00").toDF("node"), rounds = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d("n05") == 5L && d("n06") == -1L) // beyond 5 rounds: unreached
  }

  test("modularity: two clean cliques joined by one bridge score high; closed form checks") {
    // two triangles {a,b,c} {x,y,z} + bridge c-x; communities = the triangles
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
                    ("x", "y"), ("y", "z"), ("x", "z"),
                    ("c", "x")).toDF("src", "dst")
    val comm = Seq(("a", "t1"), ("b", "t1"), ("c", "t1"),
                   ("x", "t2"), ("y", "t2"), ("z", "t2")).toDF("node", "community")
    val rows = ops.Graph.modularity(edges, comm).collect()
    assert(rows.length == 2)
    val r = rows.map(x => (x.getString(0),
      (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // m=7; each triangle: m_in=3, d_tot=7 (two deg-2 + one deg-3)
    // q_term = 3/7 - (7/14)^2 = 0.178571; total = 0.357142
    assert(r("t1") == ((3L, 3L, 7L, 0.178571)))
    assert(r("t2") == ((3L, 3L, 7L, 0.178571)))
    val tot = rows.head.getDouble(rows.head.fieldIndex("modularity"))
    assert(tot == 0.357142)
  }

  test("modularity: single community containing everything scores 0") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val comm = Seq(("a", "c0"), ("b", "c0"), ("c", "c0")).toDF("node", "community")
    val out = ops.Graph.modularity(edges, comm).collect()
    // m_in = m and d_tot = 2m → q = 1 - 1 = 0
    assert(out.head.getDouble(out.head.fieldIndex("modularity")) == 0.0)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("rollingQuantilesDaily: window medians match the hand fold") {
    val e = Seq(
      (1L, ts("2024-01-01 01:00:00"), "a", 1.0),
      (2L, ts("2024-01-02 01:00:00"), "a", 9.0),
      (3L, ts("2024-01-03 01:00:00"), "a", 5.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val rows = ops.Events.rollingQuantilesDaily(e, window = 7).collect()
      .map(x => (x.getDate(1).toString, x.getDouble(3), x.getLong(5))).toList
    // medians of prefixes [1], [1,9], [1,9,5]
    assert(rows == List(("2024-01-01", 1.0, 1L),
                        ("2024-01-02", 5.0, 2L),
                        ("2024-01-03", 5.0, 3L)))
  }

  test("autocorrDaily: a perfect 2-cycle series scores r = -1 at lag 1, +1 at lag 2") {
    val e = (1 to 10).flatMap { d =>
      val v = if (d % 2 == 0) 10.0 else 20.0
      Seq((d.toLong, ts(f"2024-01-$d%02d 12:00:00"), "a", v))
    }.toDF("event_id", "ts", "event_type", "value")
    val r = ops.Events.autocorrDaily(e, maxLag = 2).collect()
      .map(x => x.getInt(1) -> x.getDouble(3)).toMap
    assert(r(1) == -1.0 && r(2) == 1.0)
  }

  test("autocorrDaily: constant series reports NULL r, not a fault") {
    val e = (1 to 5).map(d => (d.toLong, ts(f"2024-01-0$d 12:00:00"), "b", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = ops.Events.autocorrDaily(e, maxLag = 2).collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(3)))
  }

  test("seasonalAnomaly: a 3AM burst flags against its own hour-of-day baseline") {
    // type 'a': hour-03 slot has counts 0,0,0,...,0 across 9 days and
    // 90 on day 10 → that hour z-scores far out; steady hours don't
    val quiet = for (d <- 1 to 10; h <- Seq(12)) yield
      (d.toLong * 100 + h, ts(f"2024-01-$d%02d $h%02d:00:00"), "a", 1.0)
    val burst = (1 to 90).map(i =>
      (9000L + i, ts("2024-01-10 03:00:00"), "a", 1.0))
    val e = (quiet ++ burst)
      .toDF("event_id", "ts", "event_type", "value")
    val out = ops.Events.seasonalAnomaly(e, zThr = 2.0).collect()
      .map(r => (r.getInt(r.fieldIndex("hod")), r.getLong(r.fieldIndex("n"))))
    assert(out.exists { case (hod, n) => hod == 3 && n == 90L })
    // the steady noon slot never flags
    assert(!out.exists(_._1 == 12))
  }
}
