package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper: EXECUTE a registered query, then print the FINAL
  * adaptive plan — the one that shows AQE runtime decisions
  * (ReusedExchange/stage reuse, broadcast flips, skew splits) that
  * the pre-execution `explain` cannot —
  * `sbt "runMain graft.tools.FinalPlan <query> [sfDir]"`. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Queries.all(name)(spark, dir)
    df.count() // materialize so AQE finalizes every stage
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
