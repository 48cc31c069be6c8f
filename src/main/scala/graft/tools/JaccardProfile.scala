package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.SetFunctions
import graft.ops.Dedup

/** Stage-level profile for qSimJaccard (the q_dedup_cluster feed):
  * vocab build vs rank re-encode vs candidate join vs verify.
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
    time("cold_full") { println("  pairs=" + Dedup.qSimJaccard(spark, dir).count()) }
    spark.catalog.clearCache()
    val docToks = Tables.docTokens(spark, dir)
    SetFunctions.register(spark, Dedup.permA, Dedup.permB, Dedup.MersennePrime)
    val d0 = docToks.select(col("doc_id"), col("lang"),
      SetFunctions.shingleHashes(col("toks"), 1, -1L).as("hs"))
    time("shingle_hash") { d0.count() }
    val vocab = d0.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .select(col("h"), row_number().over(Window.orderBy("df", "h"))
        .cast("long").as("rank"))
    time("vocab") { println("  vocab=" + vocab.count()) }
    val d = d0.select(col("doc_id"), col("lang"), explode(col("hs")).as("h"))
      .join(broadcast(vocab), "h")
      .groupBy("doc_id", "lang")
      .agg(sort_array(collect_list(col("rank"))).as("hset"))
      .withColumn("nset", size(col("hset")))
      .persist()
    time("rank_encode") { d.count() }
    val tau = 0.9
    val prefixLen = col("nset") - ceil(col("nset") * tau).cast("int") + 1
    val pre = d.select(col("doc_id"), col("lang"), col("nset"),
                       explode(slice(col("hset"), lit(1), prefixLen)).as("p"))
    val a = pre.select(col("doc_id").as("doc_a"), col("lang"),
                       col("nset").as("n_a"), col("p"))
    val b = pre.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
                       col("nset").as("n_b"), col("p").as("p_b"))
    val candsRaw = a.join(b,
        col("lang") === col("lang_b") && col("p") === col("p_b")
          && col("doc_a") < col("doc_b")
          && col("n_a") >= col("n_b") * tau && col("n_b") >= col("n_a") * tau)
      .select("doc_a", "doc_b")
    time("cands_raw") { println("  candsRaw=" + candsRaw.count()) }
    val cands = candsRaw.dropDuplicates("doc_a", "doc_b")
    time("cands_dedup") { println("  cands=" + cands.count()) }
    val verified = cands
      .join(d.select(col("doc_id").as("doc_a"), col("hset").as("hset_a"),
                     col("nset").as("n_a")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("hset").as("hset_b"),
                     col("nset").as("n_b")), "doc_b")
      .withColumn("inter",
        SetFunctions.sortedIntersectSize(col("hset_a"), col("hset_b")))
      .select(col("doc_a"), col("doc_b"),
              (col("inter").cast("double")
                / (col("n_a") + col("n_b") - col("inter"))).as("jac"))
      .filter(col("jac") >= tau)
    time("verify") { println("  pairs=" + verified.count()) }
    spark.stop()
  }
}
