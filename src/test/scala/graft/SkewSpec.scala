package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedInnerJoin == plain inner join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .collect().head.toSeq
    val salted = Skew.saltedInnerJoin(li, o, "l_orderkey", buckets = 8)
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .collect().head.toSeq
    assert(salted == plain)
  }

  test("capability: AQE skew-join split fires on a planted skewed join (pinned against Spark upgrades)") {
    // Skew.saltedInnerJoin (above) proves the MANUAL mitigation; this
    // pins Spark's BUILT-IN OptimizeSkewedJoin — the first lever a
    // 100 TB operator reaches for — alive at fixture scale. Not a
    // registered query: the tiny thresholds that let the split fire on
    // KB-sized partitions would reshape every later join on the shared
    // session, so this demonstrates-and-restores within one test.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "true")
      // one key holds ~83% of the big side: its shuffle partition is
      // hundreds of KB while the median is a few KB — clear both the
      // factor and the (lowered) absolute threshold, and give AQE a
      // small advisory target so the split produces several reads
      conf.set(keys(2), "2.0")
      conf.set(keys(3), "64KB")
      conf.set(keys(4), "32KB")
      // skew split only applies to shuffle joins — keep the dim side
      // off the broadcast path
      conf.set(keys(5), "-1")
      import spark.implicits._
      // the payload must SURVIVE column pruning (aggregated below) and
      // resist shuffle compression (md5 per row) — a constant column
      // is pruned before the exchange and all-equal keys compress to
      // KBs, leaving nothing for the skew detector to see
      val big = spark.range(0, 60000).select(
        when(col("id") < 50000, lit(0L)).otherwise(pmod(col("id"), lit(2000L)))
          .as("k"),
        concat(md5(col("id").cast("string")),
               md5((col("id") + 1).cast("string")),
               md5((col("id") + 2).cast("string")),
               md5((col("id") + 3).cast("string"))).as("pay"))
      val dim = spark.range(0, 2000).select(col("id").as("k"),
        lit("d").as("d"))
      val q = big.join(dim, "k")
        .agg(count(lit(1)).as("n"), max(length(col("pay"))).as("pl"))
      val row = q.collect().head
      assert(row.getLong(0) == 60000L) // every big row matches one dim key
      assert(row.getInt(1) == 128)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true") || p.contains("skewed"), p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("sharedSpans df-bound kills the boilerplate-span m² blowup, keeps real dups") {
    import spark.implicits._
    import graft.ops.Dedup
    // 1000 docs all carrying the same 20-token boilerplate run (a nav/
    // legal footer), plus two docs sharing a RARE 20-token span
    val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")
    val rare = (1 to 20).map(i => s"rare$i").mkString(" ")
    val docs = (1L to 1000L).map(i => (i, s"$boiler unique${i}a unique${i}b")) ++
      Seq((2001L, s"$rare tail1"), (2002L, s"$rare tail2"))
    val toks = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val pairs = Dedup.sharedSpans(toks, w = 20, maxDf = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // unbounded, the boilerplate span alone would emit 1000·999/2 =
    // 499 500 pairs on ONE shuffle key; the df-bound drops it entirely
    assert(pairs.toSeq == Seq((2001L, 2002L)))
  }

  test("hot LSH band: salting bounds per-task candidates, pair set identical (r14)") {
    import graft.ops.Dedup
    import spark.implicits._
    // planted hot band: 300 docs whose banded rows ALL share one
    // (band, bkey) — the boilerplate-corpus worst case — plus two
    // normal buckets of 2
    val hot = (0 until 300).map(i => (i.toLong, 0, "HOTKEY"))
    val cold = Seq((1000L, 0, "c1"), (1001L, 0, "c1"),
                   (2000L, 1, "c2"), (2001L, 1, "c2"))
    val banded = (hot ++ cold).toDF("doc_id", "band", "bkey")
    // pair set is IDENTICAL to the unsalted join (threshold
    // effectively off vs on)
    def pairs(hotBucket: Int) =
      Dedup.bandCandidates(banded, hotBucket).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = pairs(Int.MaxValue)
    val salted = pairs(50)
    assert(unsalted.size == 300 * 299 / 2 + 2)
    assert(salted == unsalted, "salting changed the candidate set")
    // the bound itself: with threshold 50 the hot bucket splits into
    // ceil(300/50) = 6 salts, and no (band, bkey, salt) task sees more
    // than ~threshold probe rows — per-task candidates <= thr*|B|
    // instead of |B|^2. Recompute the salt assignment independently.
    val perSalt = (0 until 300).map { i =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val hex = md5.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 6
    }.groupBy(identity).view.mapValues(_.size)
    assert(perSalt.keySet == (0L until 6L).toSet, "salts unused")
    assert(perSalt.values.max <= 50 * 2,
      s"salt groups unbalanced: $perSalt")
    // normal buckets: nsalt = 1, no replication (cold pairs intact)
    assert(salted.contains((1000L, 1001L)) && salted.contains((2000L, 2001L)))
  }
}
