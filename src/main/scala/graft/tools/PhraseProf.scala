package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q_phrase_search — where do 30 s at sf1 go?
  * `sbt "runMain graft.tools.PhraseProf [sfDir]"` */
object PhraseProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHRASEPROF $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    t("warmup")(graft.Tables.documents(spark, dir).count())
    t("documents_count")(graft.Tables.documents(spark, dir).count())
    t("docTokens_size_sum")(graft.Tables.docTokens(spark, dir)
      .agg(sum(size(col("toks")))).head())
    t("phrase_full")(graft.Queries.all("q_phrase_search")(spark, dir).count())
    t("phrase_full2")(graft.Queries.all("q_phrase_search")(spark, dir).count())
    // no-order variant
    val p = graft.ops.Search.phraseSearch(
      graft.Tables.docTokens(spark, dir), graft.ops.Search.Phrase)
    t("phrase_no_reuse")(p.count())
    spark.stop()
  }
}
