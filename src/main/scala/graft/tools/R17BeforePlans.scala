package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r17 evidence dump, BEFORE side — run at the r16 HEAD (6fd4d03):
  * formatted plans of the operator INTERNALS round 17 changes. The
  * registered queries end in eager localCheckpoints, so their own
  * explain is a vacuous `Scan ExistingRDD` (the r16 verdict's
  * evidence-hygiene ask #8); this dumps the pre-checkpoint frames.
  * The span-depth and triad-gate fragments are verbatim replicas of
  * the r16 operator bodies (ops/Dedup.scala spanDepthProfile,
  * ops/Curation.scala crawlTriad at 6fd4d03 — diffable against git);
  * the kmeans assign dump calls the REAL operator, so at r16 code it
  * shows the literal-centroid shape and at r17 code the data-centroid
  * shape. `sbt "runMain graft.tools.R17BeforePlans [sfDir]"` */
object R17BeforePlans {
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

    // ---- q_span_depth inner frame, r16 shape (one tagged stream,
    //      groupBy(h,w) dup table + join-back, explode evaluated on
    //      both sides of the join) ----
    graft.functions.SetFunctions.register(spark,
      graft.ops.Dedup.permA, graft.ops.Dedup.permB,
      graft.ops.Dedup.MersennePrime)
    val widths = Seq(64, 32, 16, 8, 4)
    val base = graft.Tables.docTokens(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("toks"))
    val sp = base.select(col("doc_id"),
      explode(flatten(array(widths.map { w =>
        transform(graft.functions.SetFunctions.shingleHashes(col("toks"), w, 0L),
                  h => struct(h.as("h"), lit(w).as("w")))
      }: _*))).as("s"))
      .select(col("doc_id"), col("s.h").as("h"), col("s.w").as("w"))
    val dup = sp.groupBy("h", "w").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select("h", "w")
    val flags = sp.join(dup, Seq("h", "w"))
      .select(col("doc_id"), col("w")).distinct()
    val depth = flags.groupBy("doc_id").agg(max(col("w")).as("depth"))
    dump("q_span_depth inner (r16 shape: dup groupBy + join-back)",
      base.select(col("doc_id"), size(col("toks")).as("n_toks"))
        .join(depth, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
                coalesce(col("depth"), lit(0)).as("depth")))

    // ---- crawl-triad dedup gates, r16 shape (two row_number
    //      windows over full page rows) ----
    val pages = graft.ops.Curation.triadPages(spark, dir)
    val canonFirst = pages
      .withColumn("canon", graft.ops.Url.canonCol(col("url")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("canon").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val extracted = canonFirst
      .select(col("doc_id"), graft.ops.Html.contentColumn(col("html")).as("text"))
    val hashFirst = extracted
      .withColumn("rn", row_number().over(
        Window.partitionBy(sha2(col("text"), 256)).orderBy("doc_id")))
      .filter(col("rn") === 1)
    dump("crawl_triad dedup gates (r16 shape: two row_number windows)",
      hashFirst.select("doc_id", "text"))

    // ---- kmeans assign pass (calls the REAL operator: literal
    //      centroids at r16 code, data centroids at r17 code) ----
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
