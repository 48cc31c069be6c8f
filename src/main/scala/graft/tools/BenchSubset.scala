package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a SUBSET of registered queries with the Bench protocol
  * (cold once, then N interleaved full passes, per-query MIN) — the
  * iteration loop for optimization work where the full 233-query
  * suite would take 20 minutes.
  * `sbt "runMain graft.tools.BenchSubset <passes> <query> [query...]"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val passes = args.head.toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def settle(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.Queries.all(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    settle()
    names.foreach { n => timeOnce(n); settle() } // cold pass, untimed
    val samples = (1 to passes).map { _ =>
      names.map { n => val t = timeOnce(n); settle(); n -> t }.toMap
    }
    names.foreach { n =>
      val ts = samples.map(_(n))
      println(f"SUBSET $n min=${ts.min}%.3f samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
