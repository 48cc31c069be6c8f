package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the PLAN-CONSTRUCTION overhead the SQL family pays inside
  * the bench's timed region: `Tables.load` (file listing + parquet
  * footer schema inference per call) and `Sql.registerTables` (9 loads
  * + temp-view registration per query), vs the action itself.
  * `sbt "runMain graft.tools.RegProbe [sfDir] [reps]"` */
object RegProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      f // warm once
      val t0 = System.nanoTime()
      for (_ <- 1 to reps) f
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"REGPROBE $label%-28s ${ms}%8.1f ms/call")
    }

    time("load(lineitem)") { graft.Tables.load(spark, dir, "lineitem") }
    time("load(nation)") { graft.Tables.load(spark, dir, "nation") }
    time("registerTables(9)") { graft.ops.Sql.registerTables(spark, dir) }
    time("construct q_sql_q6") { graft.ops.Sql.qSqlQ6(spark, dir) }
    time("construct+count q_sql_q6") { graft.ops.Sql.qSqlQ6(spark, dir).count() }
    time("construct q_sql_q11") { graft.ops.Sql.qSqlQ11(spark, dir) }
    time("construct+count q_sql_q11") { graft.ops.Sql.qSqlQ11(spark, dir).count() }
    spark.stop()
  }
}
