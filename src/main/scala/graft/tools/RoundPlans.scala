package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the formatted plans of the FACTORED iterative round bodies
  * (pageRankRound, CC propagationRound) on a tiny in-memory fixture —
  * the loop plans a full-query explain hides behind checkpoints. */
object RoundPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val edges0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val outDeg = edges0.groupBy(col("src")).agg(count(lit(1)).as("od"))
    println("========== round:page_rank ==========")
    val edges = edges0.join(outDeg, "src")
    val nodes = Seq((1L, false), (2L, false), (3L, false), (4L, true))
      .toDF("node", "dang")
    val rank = nodes.select(col("node"), col("dang"), lit(0.25).as("r"))
    println(fmt(graft.ops.Graph.pageRankRound(nodes, edges, rank, 4L)))
    println("========== round:cc_propagation ==========")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 4L)).toDF("id", "label")
    println(fmt(graft.ops.Dedup.propagationRound(
      edges0.select(col("src"), col("dst")), labels)))
    spark.stop()
  }
}
