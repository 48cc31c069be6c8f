package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 evidence dump, AFTER side — the same operator internals
  * [[R17BeforePlans]] dumps at the r16 HEAD, through the r17 code
  * paths: span-depth via the factored [[graft.ops.Dedup.spanDepthFrame]]
  * hook, the triad dedup gates as the verbatim r17 fragment
  * (ops/Curation.scala crawlTriad), and the kmeans assign pass via the
  * real operator. `sbt "runMain graft.tools.R17AfterPlans [sfDir]"` */
object R17AfterPlans {
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

    // ---- q_span_depth inner frame (r17 shape: one window count,
    //      hash once, shuffle once) ----
    graft.functions.SetFunctions.register(spark,
      graft.ops.Dedup.permA, graft.ops.Dedup.permB,
      graft.ops.Dedup.MersennePrime)
    val base = graft.Tables.docTokens(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("toks"))
    dump("q_span_depth inner (r17 shape: window count, no join-back)",
      graft.ops.Dedup.spanDepthFrame(base, Seq(64, 32, 16, 8, 4)))

    // ---- crawl-triad dedup gates (r17 shape: two min(struct)
    //      aggregates — verbatim fragment of crawlTriad) ----
    val pages = graft.ops.Curation.triadPages(spark, dir)
    val canonFirst = pages
      .groupBy(graft.ops.Url.canonCol(col("url")).as("canon"))
      .agg(min(struct(col("doc_id"), col("html"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.html").as("html"))
    val extracted = canonFirst
      .select(col("doc_id"), graft.ops.Html.contentColumn(col("html")).as("text"))
    val hashFirst = extracted
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(struct(col("doc_id"), col("text"))).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
    dump("crawl_triad dedup gates (r17 shape: two min(struct) aggregates)",
      hashFirst.select("doc_id", "text"))

    // ---- kmeans assign pass (real operator: data centroids via
    //      broadcast (cs, c2s) row + element_at) ----
    graft.functions.VectorFunctions.register(spark)
    val v = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
    val init = v.orderBy("vec_id").limit(8)
      .collect().map(_.getSeq[Double](1)).toIndexedSeq
    dump("kmeans assign pass", graft.ops.Clustering.assign(v, init))

    // ---- CC propagation round, BOTH regimes, at a scale where the
    //      structural claim is visible (r16 verdict ask #8: the old
    //      dumps were toy-scale all-broadcast plans that showed no
    //      difference). spark.range gives the planner honest
    //      multi-megabyte size estimates, so the partitioned regime
    //      plans its real sort-merge/shuffled joins and the broadcast
    //      regime (the r17 small-graph gate) shows every join
    //      map-side with the edge scan un-shuffled. ----
    val edgesBig = spark.range(0, 20000000L)
      .select((col("id") % 5000000L).as("src"), ((col("id") * 7 + 1) % 5000000L).as("dst"))
    val labelsBig = spark.range(0, 5000000L)
      .select(col("id"), col("id").as("label"))
    dump("CC propagation round — partitioned regime (cluster-scale node set)",
      graft.ops.Dedup.propagationRound(edgesBig, labelsBig, broadcastLabels = false))
    dump("CC propagation round — broadcast regime (small measured node set)",
      graft.ops.Dedup.propagationRound(edgesBig, labelsBig, broadcastLabels = true))

    // ---- LPA round fragment (r16 claim now visible at range scale:
    //      arg-max is a min(struct) partial aggregate — no WindowExec
    //      anywhere in the round) ----
    val undBig = edgesBig.select(col("src").as("a"), col("dst").as("b"))
    val lblsBig = labelsBig.select(col("id").as("node"), col("id").as("lbl"))
    val freqBig = undBig.join(lblsBig, undBig("b") === lblsBig("node"))
      .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("cnt"))
    dump("LPA round arg-max (min(struct) aggregate, no window)",
      freqBig.groupBy(col("a"))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("b"))
        .select(col("a").as("node"), col("b.lbl").as("newl")))

    spark.stop()
  }
}
