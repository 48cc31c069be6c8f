package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-built-data specs for winsorize, Benford audit, robust
  * (median/MAD) outliers, and the runtime bloom-filter join-pruning
  * capability demonstration. */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("winsorize: clip bounds, counts, and means on a known tail") {
    // group g: values 1..9 plus a 1000 outlier; p05/p95 interpolate
    // over the sorted 10 values
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("grp", "v")
    val r = ops.Profile.winsorize(df, "grp", "v", lo = 0.1, hi = 0.9).collect().head
    // h = (n-1)*q: p10 = 1.9, p90 = 9*0.1+1000*0.9... = sorted[8.1] = 9 + 0.1*(991)
    assert(r.getDouble(r.fieldIndex("p_lo")) == 1.9)
    assert(r.getDouble(r.fieldIndex("p_hi")) == 108.1)
    assert(r.getLong(r.fieldIndex("n_clip_lo")) == 1L)  // value 1
    assert(r.getLong(r.fieldIndex("n_clip_hi")) == 1L)  // the outlier
    assert(r.getDouble(r.fieldIndex("mean_before")) == 104.5)
    // clipped: 1.9, 2..9, 108.1 → sum 154.0 → mean 15.4
    assert(r.getDouble(r.fieldIndex("mean_after")) == 15.4)
  }

  test("benford: a perfectly Benford-distributed sample scores ~zero chi2") {
    // counts proportional to log10(1+1/d) out of 1000
    val rows = (1 to 9).flatMap { d =>
      val n = math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(n)(d * 100.0 + 1) // first digit d
    }
    val r = ops.Profile.benford(rows.toDF("v"), "v").collect()
    assert(r.map(_.getInt(0)).toSeq == (1 to 9))
    // rounding to integer counts leaves only tiny residuals
    assert(r.map(_.getDouble(4)).sum < 0.1)
    // shares descend with digit (the Benford signature)
    val shares = r.map(_.getDouble(2))
    assert(shares.zip(shares.tail).forall { case (a, b) => a > b })
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("robustOutliers: a single huge spike cannot hide itself") {
    // 14 jittered quiet days (1..3 events) + one day of 60: the case
    // where mean/std self-inflation weakens plain z but median/MAD
    // shrugs — med ≈ 2, MAD ≈ 1, rz ≈ 0.6745·58 ≫ 3.5
    val quiet = for (d <- 1 to 15 if d != 8; i <- 1 to (d % 3 + 1))
      yield (d.toLong * 10 + i, ts(f"2024-01-$d%02d 12:00:00"), "a", 1.0)
    val spike = (1 to 60).map(i => (800L + i, ts("2024-01-08 12:00:00"), "a", 1.0))
    val out = ops.Events.robustOutliers((quiet ++ spike)
        .toDF("event_id", "ts", "event_type", "value"))
      .collect().map(r => (r.getDate(1).toString,
        r.getLong(2), r.getDouble(5), r.getBoolean(6)))
    val flagged = out.filter(_._4)
    assert(flagged.map(_._1).toSeq == Seq("2024-01-08"))
    assert(out.length == 15)
  }

  test("robustOutliers: MAD zero guard yields rz 0, not NaN") {
    val e = (1 to 3).map(d => (d.toLong, ts(f"2024-01-0$d 12:00:00"), "b", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = ops.Events.robustOutliers(e).collect()
    assert(out.forall(r => !r.getDouble(5).isNaN))
  }

  test("capability: runtime bloom-filter join pruning fires when thresholds allow") {
    // not a registered query: the thresholds that let the bloom filter
    // fire at test scale (applicationSideScanSizeThreshold=0) would
    // leak blooms into EVERY later join on the shared session, so this
    // demonstrates-and-restores within one test
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "0")
      conf.set(keys(2), "100MB")
      // blooms inject only for SHUFFLE joins — at fixture scale the
      // dim side would broadcast and skip injection
      conf.set(keys(3), "-1")
      val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val l = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      val q = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("BloomFilter")
        || p.contains("might_contain"), p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
