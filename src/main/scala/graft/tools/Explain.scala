package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected queries — the plan
  * audit loop (pushdown reaching parquet, dims broadcast, codegen
  * spans). `sbt "runMain graft.tools.Explain [sfDir] [name...]"` */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q_scan_project", "q_filter_pred", "q_join_broadcast",
                         "q_agg_scan", "q_sim_cosine_topk", "q_tfidf")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.Queries.all(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
