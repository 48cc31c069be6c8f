package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs one registered query and prints its row count — the smallest
  * repro loop for a failing registry entry.
  * `sbt "runMain graft.tools.RunOne <query> [sfDir]"` */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional repeat count: run N times, print each — the warm
    // (steady-state) time is the one comparable to Bench's in-suite
    // numbers; the first includes session/codegen/page-cache warmup
    val reps = if (args.length > 2) args(2).toInt else 1
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.Queries.all(name)(spark, dir).count()
      println(f"RUNONE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs rep=$i")
    }
    spark.stop()
  }
}
