package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall profile of the zipf pipeline pieces —
  * `tools/run_main.sh graft.tools.ZipfProf <sfDir>`. */
object ZipfProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"ZIPFPROF $label%-28s n=$n%12d t=${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    val toks = graft.Tables.docTokens(spark, dir)
    t("warmup docs.count")(toks.count())
    val w = toks.select(explode(col("toks")).as("w"))
    t("explode.count")(w.count())
    val counts = w.groupBy("w").agg(count(lit(1)).as("c"))
    t("counts.count")(counts.count())
    t("counts.count again")(counts.count())
    t("top1000")(counts.orderBy(col("c").desc, col("w").asc).limit(1000).count())
    t("totals")(counts.agg(count(lit(1)), sum("c")).count())
    t("full q_zipf_fit")(graft.Queries.all("q_zipf_fit")(spark, dir).count())
    spark.stop()
  }
}
