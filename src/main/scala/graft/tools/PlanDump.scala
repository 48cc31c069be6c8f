package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper: print the executed plan of a registered query —
  * `sbt "runMain graft.tools.PlanDump <query> [sfDir]"`. */
object PlanDump {
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
    println(graft.Queries.all(name)(spark, dir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
