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

    spark.stop()
  }
}
