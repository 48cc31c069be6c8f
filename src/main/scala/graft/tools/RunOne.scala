package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs one registered query and prints its row count — the smallest
  * repro loop for a failing registry entry.
  * `sbt "runMain graft.tools.RunOne <query> [sfDir]"` */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.Queries.all(name)(spark, dir).count()
    println(f"RUNONE $name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
