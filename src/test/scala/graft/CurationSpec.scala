package graft

import org.scalatest.funsuite.AnyFunSuite

/** Curation operators through the public facade on hand-built data —
  * semantics the DuckDB oracle can't pin: cross-bucket prefix-sum
  * correctness in packChunks, posting-list bounding, deterministic
  * sampling invariants, planted contamination/repetition. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("src1"))

  test("packChunks: offsets are the exact global cumsum across buckets") {
    // bucketSpan=2 forces doc_ids 0..5 into 3 range buckets, so the
    // cross-bucket prefix join is exercised, not just one window
    val docs = mkDocs(
      0L -> "a b c",          // 3 toks, offset 0
      1L -> "d e",            // 2, offset 3
      2L -> "f g h i",        // 4, offset 5
      3L -> "j",              // 1, offset 9
      4L -> "k l m",          // 3, offset 10
      5L -> "n o")            // 2, offset 13
    val out = Graft.packChunks(docs, budget = 5, bucketSpan = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 3L, 0L, 0L), (1L, 2L, 3L, 0L), (2L, 4L, 5L, 1L),
      (3L, 1L, 9L, 1L), (4L, 3L, 10L, 2L), (5L, 2L, 13L, 2L)))
  }

  test("packChunks: chunk boundaries respect the token budget") {
    val rng = new scala.util.Random(3)
    val docs = mkDocs((0L until 60L).map(i =>
      i -> Seq.fill(1 + rng.nextInt(9))("w").mkString(" ")): _*)
    val out = Graft.packChunks(docs, budget = 16, bucketSpan = 7).collect()
    var cum = 0L
    out.sortBy(_.getLong(0)).foreach { r =>
      assert(r.getLong(2) == cum, s"offset mismatch at doc ${r.getLong(0)}")
      assert(r.getLong(3) == cum / 16)
      cum += r.getLong(1)
    }
  }

  test("decontaminate finds the planted 4-gram overlap and nothing else") {
    val train = mkDocs(
      1L -> "alpha beta gamma delta epsilon zeta",   // shares 4-grams with eval
      2L -> "one two three four five six seven")     // clean
    val eval = mkDocs(
      100L -> "alpha beta gamma delta something else",
      101L -> "beta gamma delta epsilon other words")
    val hits = Graft.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 hits: "alpha beta gamma delta" (eval 100) and
    // "beta gamma delta epsilon" (eval 101) -> 2 grams, 2 eval docs
    assert(hits == Map(1L -> ((2L, 2L))))
  }

  test("repetitionMetrics flags the spam doc, passes the clean one") {
    val out = Graft.repetitionMetrics(mkDocs(
        1L -> "spam spam spam spam spam spam spam spam",
        2L -> "every token here is completely unique today"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._1 == 0.875 && out(1L)._2 > 0.8 && out(1L)._3)
    assert(out(2L)._1 == 0.0 && out(2L)._2 == 0.0 && !out(2L)._3)
  }

  test("sampleHash: deterministic, monotone in threshold, subset of corpus") {
    val docs = mkDocs((0L until 200L).map(i => i -> s"doc $i"): _*)
    val s10a = Graft.sampleHash(docs, "1999").collect().map(_.getLong(0)).toSet
    val s10b = Graft.sampleHash(docs, "1999").collect().map(_.getLong(0)).toSet
    val s50 = Graft.sampleHash(docs, "8000").collect().map(_.getLong(0)).toSet
    assert(s10a == s10b)                      // rerun-identical
    assert(s10a.subsetOf(s50))                // threshold-monotone
    assert(s10a.nonEmpty && s50.size < 200)   // neither degenerate
    assert(Graft.sampleHash(docs, "0000").collect().isEmpty)
  }

  test("stratifiedSample yields exactly n per stratum, deterministic") {
    val docs = (0L until 90L).map(i => (i, s"text $i", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("src0"))
    val out = Graft.stratifiedSample(docs, n = 7).collect()
    assert(out.length == 21)
    assert(out.groupBy(_.getString(1)).forall(_._2.length == 7))
    val again = Graft.stratifiedSample(docs, n = 7).collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("mixWeighted: kept counts bounded by totals, tier rule applied") {
    val docs = (0L until 300L).map(i => (i, s"text $i", "en", s"src${i % 6}"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Graft.mixWeighted(docs).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.size == 6)
    out.foreach { case (src, (tier, total, kept)) =>
      assert(tier == src.drop(3).toInt % 3)
      assert(kept <= total && total == 50)
    }
    // 80% tier keeps more than 10% tier on any non-tiny source (md5 is
    // uniform; 50 draws at 80% vs 10% cannot invert order)
    assert(out("src0")._3 > out("src2")._3)
  }

  test("weightedSample: keep rate tracks the milli-weight, weights exact, deterministic") {
    import org.apache.spark.sql.functions.{col, split, lit}
    // 400 top-quality docs (100 distinct non-stop tokens → w = 300 +
    // 300 + 400 = 999) and 400 junk docs (one stopword repeated →
    // w = 300 + (1·300) div 100 + 0 = 303); disjoint id ranges
    val rich = (0 until 100).map(i => s"tok$i").mkString(" ")
    val junk = Seq.fill(100)("the").mkString(" ")
    val docs = ((0L until 400L).map(_ -> rich) ++
                (1000L until 1400L).map(_ -> junk))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src1"))
      .withColumn("toks", split(col("text"), " "))
    val out = Graft.weightedSample(docs).collect()
    val kept = out.map(r => r.getLong(0)).toSet
    val w = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    // integer weights exact per class
    assert(w.filter(_._1 < 400L).values.forall(_ == 999L), w.take(5))
    assert(w.filter(_._1 >= 1000L).values.forall(_ == 303L), w.take(5))
    // keep rate ≈ w/1000 (binomial over fixed md5 draws; wide margin)
    val rRich = kept.count(_ < 400L) / 400.0
    val rJunk = kept.count(_ >= 1000L) / 400.0
    assert(math.abs(rRich - 0.999) < 0.05, s"rich rate $rRich")
    assert(math.abs(rJunk - 0.303) < 0.08, s"junk rate $rJunk")
    assert(rRich > rJunk + 0.3)
    // deterministic: identical sample on a re-run
    val again = Graft.weightedSample(docs).collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("invertedIndex: exact df/cf, postings bounded and sorted") {
    val docs = mkDocs((0L until 30L).map(i =>
      i -> (if (i % 2 == 0) "common rare" else "common only")): _*)
    val out = Graft.invertedIndex(docs, minDf = 5, maxPostings = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out("common") == ((30L, 30L, "0,1,2,3")))   // bounded to 4
    assert(out("rare") == ((15L, 15L, "0,2,4,6")))     // even docs only
    assert(!out.contains("only") || out("only")._1 >= 5L)
  }

  test("chunkDocs: exact overlapping windows, full token coverage") {
    val docs = mkDocs(
      1L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", // 10 toks, 4 chunks
      2L -> "s1 s2 s3")                        // shorter than size: 1 chunk
    val out = Graft.chunkDocs(docs, size = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t5 t6 t7 t8", 4),
      (1L, 3, "t7 t8 t9 t10", 4),
      (2L, 0, "s1 s2 s3", 3)))
  }

  test("bloomDecontaminate: no false negatives vs the exact join") {
    val train = mkDocs(
      1L -> "alpha beta gamma delta epsilon zeta",    // contaminated
      2L -> "one two three four five six seven",      // clean
      3L -> "beta gamma delta epsilon trailing words") // contaminated
    val eval = mkDocs(100L -> "alpha beta gamma delta epsilon other")
    val exactHits = Graft.decontaminate(train, eval)
      .collect().map(_.getLong(0)).toSet
    val bloom = Graft.bloomDecontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // every exact hit is flagged — the Bloom one-sided-error guarantee
    assert(exactHits.forall(bloom(_)), s"false negative: $exactHits vs $bloom")
    assert(bloom.size == 3) // every train doc reported
  }

  test("bloomDecontaminate: false-positive flags are rare at the sf0.001 corpus") {
    val spark0 = spark
    val d = Tables.docTokens(spark0, TestSpark.sf0001)
    val eval = d.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    val train = d.filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
    val exact = ops.Curation.decontaminate(train, eval)
      .collect().map(_.getLong(0)).toSet
    val flagged = ops.Curation.bloomDecontaminate(train, eval)
      .filter("contaminated").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged))
    // with ~29 bits/gram the sketch adds (at most) a handful of FPs
    assert((flagged -- exact).size <= math.max(2, exact.size / 10),
      s"too many bloom false positives: ${(flagged -- exact).size}")
  }

  test("temperatureMix: two-level rank == global rank; α=1/2 upweights the tail") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark0 = spark
    val docs = Tables.documents(spark0, TestSpark.sf0001)
    val out = ops.Curation.temperatureMix(docs)
    // (a) the bucketed two-level rank must equal the naive global rank
    val naive = docs
      .select(col("doc_id"), col("lang"),
              md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
    val mismatch = out.alias("o")
      .join(naive.alias("n"), Seq("doc_id", "lang"))
      .filter(col("o.rn") =!= col("n.rn"))
    assert(mismatch.count() === 0)
    // (b) per-lang sample rate decreases with language size (α < 1)
    val rates = out.groupBy("lang").count().alias("k")
      .join(docs.groupBy("lang").count().alias("t")
              .withColumnRenamed("count", "total"), "lang")
      .select(col("lang"), col("count").cast("double") / col("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val big = totals.maxBy(_._2)._1
    val small = totals.minBy(_._2)._1
    assert(rates(small) > rates(big),
      s"temperature should upweight $small over $big: $rates")
    // (c) quota totals land near the target N = total/2
    val picked = out.count().toDouble
    val n = totals.values.sum / 2.0
    assert(math.abs(picked - n) <= totals.size + 1, s"picked=$picked target=$n")
  }

  test("dsirWeights: target-like docs outrank off-domain docs, features counted, order pinned") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq(
      (0L, "alpha beta gamma delta", "tgt"),
      (1L, "alpha beta gamma epsilon", "tgt"),
      (2L, "alpha beta gamma zeta", "raw"), // shares the target vocab
      (3L, "qq rr ss tt", "raw"),           // disjoint off-domain vocab
      (4L, "alpha beta qq rr", "raw")       // half in, half out
    ).toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val out = Graft.dsirWeights(docs, col("source") === "tgt", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.map(t => t._1 -> t).toMap
    // unigrams + bigrams: 4 + 3 per 4-token doc
    assert(byId(2L)._2 === 7L)
    // on-domain > mixed > off-domain
    assert(byId(2L)._3 > byId(4L)._3, s"$byId")
    assert(byId(4L)._3 > byId(3L)._3, s"$byId")
    // result arrives sorted by weight descending (doc_id tiebreak)
    val ws = out.map(_._3).toSeq
    assert(ws == ws.sorted.reverse, s"$ws")
    // weight scale sanity: off-domain features never seen in target →
    // each term ln(1/(n_t+B)) − ln((c_r+1)/(n_r+B)) < 0
    assert(byId(3L)._3 < 0.0)
  }

  test("dsirModel + dsirScoreCols: the stateless scorer agrees with the join-path scorer") {
    import org.apache.spark.sql.functions.{col, lit, split, lower, trim}
    val docs = Seq(
      (0L, "alpha beta gamma delta", "tgt"),
      (1L, "alpha beta gamma epsilon", "tgt"),
      (2L, "alpha beta gamma zeta", "raw"),
      (3L, "qq rr ss tt", "raw"),
      (4L, "alpha beta qq rr", "raw")
    ).toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
      .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
    val isTgt = col("source") === "tgt"
    val joinPath = graft.ops.Curation.dsirScores(docs, isTgt)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val (model, default) = graft.ops.Curation.dsirModel(docs, isTgt)
    val modelPath = graft.ops.Curation.dsirScoreCols(docs, model, default)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_w")).toMap
    assert(joinPath.keySet == modelPath.keySet)
    // identical up to float fold order (both round at 6 dp, so paths
    // can differ by at most one ulp-at-the-6th-decimal)
    joinPath.foreach { case (id, w) =>
      assert(math.abs(w - modelPath(id)) <= 1.1e-6, s"doc $id: $w vs ${modelPath(id)}")
    }
  }

  test("shuffleShards: balanced round-robin deal of a reproducible permutation") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = Graft.shuffleShards(docs, "saltA", 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    // disjoint total deal: every doc exactly once
    assert(a.map(_._1).distinct.length == a.length && a.length == docs.count())
    // balanced to +-1
    val sizes = a.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"sizes: $sizes")
    // within a shard, pos_in_shard is dense 0..k-1
    a.groupBy(_._3).foreach { case (s, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (0L until rows.length).toSeq, s"shard $s")
    }
    // reproducible; a new salt yields a genuinely different order
    val a2 = Graft.shuffleShards(docs, "saltA", 7)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(a.map(t => (t._1, t._3, t._4)).toSeq == a2.toSeq)
    val b = Graft.shuffleShards(docs, "saltB", 7)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(b.toSeq != a2.toSeq)
    // the permutation is the md5 order, not doc_id order
    val byPos = a.sortBy(t => (t._3, t._4)).map(_._1).toSeq
    assert(byPos != byPos.sorted)
  }

  test("mixInterleave: any prefix carries the proportional mix; within-source order monotone") {
    val spark0 = spark
    import spark0.implicits._
    // 80 docs of A, 20 of B: sqrt weights 8.94 vs 4.47 → A should fill
    // ~2x as fast as B in every prefix
    val docs = ((1 to 80).map(i => (i.toLong, "A")) ++
                (101 to 120).map(i => (i.toLong, "B")))
      .toDF("doc_id", "source")
    val out = Graft.mixInterleave(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 100)
    // global positions are a permutation of 0..99
    assert(out.map(_._4).sorted.toSeq == (0L until 100L).toSeq)
    val order = out.sortBy(_._4)
    // within-source order preserved in the global order
    Seq("A", "B").foreach { s =>
      val posInSrc = order.filter(_._2 == s).map(_._3).toSeq
      assert(posInSrc == posInSrc.sorted, s"source $s emitted out of order")
    }
    // proportional fill: while BOTH sources still have docs, each
    // source's contribution tracks prefix * w_s / sum(w) within a
    // 2-doc rounding band. B (20 docs at weight sqrt(20)) exhausts at
    // global prefix 60 — the schedule is proportional only until a
    // source runs dry, then the remainder is all A by construction
    val (wA, wB) = (math.sqrt(80.0), math.sqrt(20.0))
    (10 to 60 by 10).foreach { k =>
      val nA = order.take(k).count(_._2 == "A")
      val exp = k * wA / (wA + wB)
      assert(math.abs(nA - exp) <= 2.0, s"prefix $k: A=$nA expected≈$exp")
    }
    // after exhaustion the tail is pure A
    assert(order.drop(80).forall(_._2 == "A"))
  }

  test("lengthBatches: same-bucket batches, longest-first, dense slots") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val out = Graft.lengthBatches(docs, bucketWidth = 32, batchSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out.length == docs.count())
    // bucket is the length bucket
    out.foreach { case (_, n, b, _, _) => assert(b == (n / 32).toInt) }
    out.groupBy(t => (t._3, t._4)).foreach { case ((b, batch), rows) =>
      assert(rows.length <= 8, s"batch ($b,$batch) overfull")
      // slots dense 0..k-1
      assert(rows.map(_._5).sorted.toSeq == (0 until rows.length).toSeq)
      // within a bucket, batch_id 0 holds the longest docs: every doc in
      // batch k is >= every doc in batch k+1 (longest-first deal)
    }
    out.groupBy(_._3).foreach { case (b, rows) =>
      val byBatch = rows.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.map(_._2))
      byBatch.sliding(2).foreach {
        case Seq(hi, lo) => assert(hi.min >= lo.max, s"bucket $b not longest-first")
        case _ => ()
      }
    }
  }
}
