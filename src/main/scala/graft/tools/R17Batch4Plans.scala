package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17 batch-4 evidence dump: BEFORE fragments are verbatim replicas
  * of the pre-change operator bodies (diffable against git history);
  * AFTER sides call the real operators.
  * `sbt "runMain graft.tools.R17Batch4Plans [sfDir]"` */
object R17Batch4Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(label: String, df: DataFrame): Unit = {
      println(s"\n========== $label ==========")
      df.explain("formatted")
    }

    // ---- q_collocations BEFORE (r16 shape: totals re-explode the
    //      corpus — four token scans) ----
    val docToks = graft.Tables.docTokens(spark, dir)
    locally {
      val toks = docToks.select(col("toks"))
      val uni = toks.select(explode(col("toks")).as("w"))
      val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
      val n1 = uni.agg(count(lit(1)).cast("double").as("n1"))
      val bg = toks.select(explode(graft.ops.Text.ngramCol(col("toks"), 2)).as("bigram"))
      val bc = bg.groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      val n2 = bg.agg(count(lit(1)).cast("double").as("n2"))
      val before = bc.filter(col("c_ab") >= 5)
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uc.select(col("w").as("w1"), col("c").as("c_1")), "w1")
        .join(uc.select(col("w").as("w2"), col("c").as("c_2")), "w2")
        .crossJoin(broadcast(n1))
        .crossJoin(broadcast(n2))
        .select(col("bigram"), col("c_ab"),
                round(log((col("c_ab") / col("n2"))
                  / ((col("c_1") / col("n1")) * (col("c_2") / col("n1")))), 6)
                  .as("pmi"))
        .orderBy(col("pmi").desc, col("bigram").asc).limit(50)
      dump("q_collocations BEFORE (4 corpus scans: totals re-explode)", before)
    }
    dump("q_collocations AFTER (totals from the grouped tables: 2 scans)",
      graft.ops.TextAnalysis.collocations(docToks))

    // ---- q_ks_test BEFORE (r16 shape: separate srcTot/allTot
    //      aggregates joined back + max-and-rejoin) ----
    val perDoc = graft.ops.TextAnalysis.corpusQualityStats(spark, dir)
      .select(col("source"), col("n_toks"))
    locally {
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val vc = perDoc.groupBy(col("source"), col("n_toks").as("v"))
        .agg(count(lit(1)).as("c"))
      val perVal = vc.groupBy("v").agg(sum(col("c")).as("ct"))
      val srcTot = vc.groupBy("source").agg(sum(col("c")).as("n_src"))
      val allTot = perVal.agg(sum(col("ct")).as("n_all"))
      val grid = vc.select("source").distinct()
        .crossJoin(vc.select("v").distinct())
      val w = Window.partitionBy("source").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = grid.join(vc, Seq("source", "v"), "left").na.fill(0L, Seq("c"))
        .join(perVal, "v")
        .withColumn("cum_src", sum(col("c")).over(w))
        .withColumn("cum_all", sum(col("ct")).over(w))
        .join(srcTot, "source").crossJoin(allTot)
        .withColumn("n_rest", col("n_all") - col("n_src"))
        .withColumn("num",
          abs(dec(col("cum_src")) * dec(col("n_rest")) -
              dec(col("cum_all") - col("cum_src")) * dec(col("n_src"))))
      val mx = t.groupBy("source").agg(max(col("num")).as("num_max"),
        first(col("n_src")).as("n_src"), first(col("n_rest")).as("n_rest"))
      val before = t.select(col("source"), col("v"), col("num"))
        .join(mx, "source").filter(col("num") === col("num_max"))
        .groupBy(col("source"))
        .agg(first(col("n_src")).as("n_src"),
             first(col("n_rest")).as("n_rest"),
             min(col("v")).as("ks_at"),
             first(col("num_max")).as("num_max"))
        .select(col("source"), col("n_src"), col("n_rest"), col("ks_at"),
          when(col("n_rest") === 0L, lit(0.0)).otherwise(
            round(col("num_max").cast("double") /
                    (col("n_src") * col("n_rest")).cast("double"), 6))
            .as("ks_d"))
        .orderBy("source")
      dump("q_ks_test BEFORE (side aggregates + max-rejoin)", before)
    }
    dump("q_ks_test AFTER (scalars and max ride the source window)",
      graft.ops.Profile.ksBySource(perDoc))

    // ---- q_join_skew: salted join strategy (batch 2). BEFORE is the
    //      verbatim un-hinted fragment (Catalyst broadcasts the
    //      x8-replicated dim side); AFTER is the real operator with
    //      the SHUFFLE_HASH hint. ----
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"),
              (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = graft.Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    locally {
      val s = li.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      val ob = o.withColumn("__salt", explode(sequence(lit(0), lit(7))))
      val before = s.join(ob, Seq("o_orderkey", "__salt"), "inner").drop("__salt")
        .groupBy("o_orderpriority")
        .agg(round(sum(col("rev")), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
      dump("q_join_skew BEFORE (no hint: replicated dim side broadcasts)", before)
    }
    dump("q_join_skew AFTER (SHUFFLE_HASH: replicated build distributed)",
      graft.ops.Relational.qJoinSkew(spark, dir))

    // ---- q_perplexity_kn: BEFORE = verbatim un-checkpointed count
    //      tables (the bigram explode feeds four consumers); AFTER =
    //      real operator (bc checkpointed). ----
    locally {
      val docToks2 = graft.Tables.docTokens(spark, dir)
      val bg = docToks2
        .select(col("doc_id"),
                explode(arrays_zip(
                  slice(col("toks"), lit(1), size(col("toks")) - 1),
                  slice(col("toks"), lit(2), size(col("toks")) - 1))).as("b"))
        .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
      val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val lc = bc.groupBy("w1")
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fwd"))
      val cc = bc.groupBy("w2").agg(count(lit(1)).as("n1back"))
      val tt = bc.agg(count(lit(1)).as("t"))
      val d = lit(0.75)
      val p = greatest(col("c12") - d, lit(0.0)) / col("c1") +
        d * col("n1fwd") / col("c1") * (col("n1back") / col("t"))
      val before = bg.join(bc, Seq("w1", "w2"))
        .join(lc, "w1").join(cc, "w2").crossJoin(broadcast(tt))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), (-avg(log(p))).as("nll"))
        .select(col("doc_id"), col("n_bigrams"),
                round(col("nll"), 6).as("nll"),
                round(exp(col("nll")), 6).as("ppl"))
        .orderBy("doc_id")
      dump("q_perplexity_kn BEFORE (bigram-count subtree replicated per consumer)",
        before)
    }
    dump("q_perplexity_kn AFTER (bigram-type table checkpointed once)",
      graft.ops.TextAnalysis.perplexityKn(graft.Tables.docTokens(spark, dir)))

    spark.stop()
  }
}
