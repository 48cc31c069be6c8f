package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stable alphabetical order: per-query timings comparable across
    // rounds (Map iteration order is hash-arbitrary), and the same
    // query always absorbs the first-job JVM/codegen warmup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // closest analogs of BASELINE.md's 7-query suite, for an
    // apples-to-apples subtotal next to the full-registry total
    val baselineSubset = Seq("q_agg_scan", "q_join_left", "q_window_topk",
      "q_ngram_count", "q_sim_cosine_topk", "q_stream_tumbling", "q_dedup_exact")
    val rmap = results.toMap
    val subsetTotal = baselineSubset.flatMap(rmap.get).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","baseline_subset_total":$subsetTotal,"n_queries":${results.size}}""")
    spark.stop()
  }
}
