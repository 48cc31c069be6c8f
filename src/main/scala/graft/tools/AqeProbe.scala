package graft.tools
import org.apache.spark.sql.SparkSession
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val aqe = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      val n = graft.Queries.all(name)(spark, "/root/testdata/sf0.1").count()
      println(f"AQEPROBE $name aqe=$aqe rep=$i rows=$n t=${(System.nanoTime()-t0)/1e9}%.3fs")
    }
    spark.stop()
  }
}
