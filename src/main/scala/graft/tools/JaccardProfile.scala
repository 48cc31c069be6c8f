package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Dedup

/** Cold/warm timings for the prefix-filtered jaccard join and the
  * cluster query that feeds on it — the two heaviest registry entries.
  * (Stage-level introspection: see the scaladoc of
  * [[graft.ops.Dedup.jaccardPairs]]; this tool intentionally times the
  * REAL code paths instead of maintaining a drifting replica.)
  * `sbt "runMain graft.tools.JaccardProfile [sfDir]"` */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"JAC_STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    time("jaccard_cold") {
      println("  pairs=" + Dedup.qSimJaccard(spark, dir).count())
    }
    time("jaccard_warm") { Dedup.qSimJaccard(spark, dir).count() }
    spark.catalog.clearCache()
    time("cluster_cold") {
      println("  rows=" + Dedup.qDedupCluster(spark, dir).count())
    }
    spark.stop()
  }
}
