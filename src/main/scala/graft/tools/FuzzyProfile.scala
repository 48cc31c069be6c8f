package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the fuzzy family's build/consume split —
  * `sbt "runMain graft.tools.FuzzyProfile [sfDir]"`. */
object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FUZZYPROF $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(graft.Queries.all("q_agg_scan")(spark, dir).count())
    val customer = graft.Tables.customer(spark, dir)
      .select(col("c_name").as("s"))
    t("distinct_pairs_count")(
      graft.ops.Fuzzy.distinctFuzzyPairs(customer, "s").count())
    t("distinct_pairs_count2")(
      graft.ops.Fuzzy.distinctFuzzyPairs(customer, "s").count())
    val p = java.nio.file.Files.createTempDirectory("fp").toString + "/p.parquet"
    t("distinct_pairs_write")(
      graft.ops.Fuzzy.distinctFuzzyPairs(customer, "s")
        .write.mode("overwrite").parquet(p))
    t("q_fuzzy_join_build+consume")(
      graft.Queries.all("q_fuzzy_join")(spark, dir).count())
    t("q_fuzzy_join_consume")(
      graft.Queries.all("q_fuzzy_join")(spark, dir).count())
    t("q_jaro_sim_consume")(
      graft.Queries.all("q_jaro_sim")(spark, dir).count())
    t("q_entity_resolution_consume")(
      graft.Queries.all("q_entity_resolution")(spark, dir).count())
    t("q_entity_resolution_consume2")(
      graft.Queries.all("q_entity_resolution")(spark, dir).count())
    println(s"FUZZYPROF cc_rounds ${graft.ops.Dedup.lastPropagationRounds}")
    // stage split inside entity resolution
    graft.functions.GraftFunctions.registerAll(spark)
    val ids = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val dp = graft.ops.Fuzzy.customerDistinctPairs(spark, dir)
    val names = ids.groupBy("s")
      .agg(min(col("id")).as("nid"), count(lit(1)).as("cnt"))
    val edges = dp
      .filter(round(graft.functions.StringSimilarity
        .jaroWinkler(col("s_a"), col("s_b")), 6) >= 0.9)
      .join(names.select(col("s").as("s_a"), col("nid").as("src")), Seq("s_a"))
      .join(names.select(col("s").as("s_b"), col("nid").as("dst")), Seq("s_b"))
      .select("src", "dst")
    t("er_edges_count")(edges.count())
    t("er_cc")(graft.ops.Graph.connectedComponents(edges).count())
    println(s"FUZZYPROF cc_rounds2 ${graft.ops.Dedup.lastPropagationRounds}")
    val edgesCk = edges.localCheckpoint()
    t("er_cc_on_checkpointed")(
      graft.ops.Graph.connectedComponents(edgesCk).count())
    spark.stop()
  }
}
