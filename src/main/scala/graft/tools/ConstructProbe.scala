package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits a registered query's warm time into CONSTRUCT (the entry
  * point returning its DataFrame — includes any eager work the
  * operator does), PLAN (analysis + optimization + physical planning
  * of the returned frame), and ACTION (the bench's count) — the §1
  * "where does the time actually go" probe for queries whose stage
  * wall is far below their bench wall.
  * `sbt "runMain graft.tools.ConstructProbe <reps> <query...>"` */
object ConstructProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.head.toInt
    val names = args.drop(1).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    }
    names.foreach { n =>
      graft.Queries.all(n)(spark, dir).count(); settle() // warm, untimed
      var (tc, tp, ta) = (0L, 0L, 0L)
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = graft.Queries.all(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        tc += t1 - t0; tp += t2 - t1; ta += t3 - t2
        settle()
      }
      println(f"CONSTRUCT $n%-24s construct=${tc / 1e6 / reps}%7.1f ms  " +
        f"plan=${tp / 1e6 / reps}%7.1f ms  action=${ta / 1e6 / reps}%7.1f ms")
    }
    spark.stop()
  }
}
