package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TopKFunctions, VectorFunctions}

/** Stage-level profile for q_knn: pair scoring vs mirror-explode vs the
  * native top-k aggregate, with and without the ObjectHashAggregate
  * hash-mode threshold the bench session sets.
  * `sbt "runMain graft.tools.KnnProfile [sfDir]"` */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"KNN_STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    VectorFunctions.register(spark)
    TopKFunctions.register(spark)
    val u = graft.ops.Similarity.normalizeEmbeddings(Tables.embeddings(spark, dir))
    time("normalize_count") { println(s"  n=${u.count()}") }
    val a = u.select(col("vec_id").as("id_a"), col("vn").as("vn_a"))
    val b = u.select(col("vec_id").as("id_b"), col("vn").as("vn_b"))
    val scored = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              VectorFunctions.dot(col("vn_a"), col("vn_b")).as("cos_sim"))
    time("pairs_dot_count") { println(s"  pairs=${scored.count()}") }
    val rounded = scored.withColumn("cos_sim", round(col("cos_sim"), 6))
    time("pairs_rounded_count") { rounded.count() }
    val mirrored = rounded
      .select(explode(array(
        struct(col("id_a"), col("id_b"), col("cos_sim")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b"), col("cos_sim"))))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
              col("p.cos_sim").as("cos_sim"))
    time("mirrored_count") { mirrored.count() }
    val cut = mirrored.groupBy("id_a")
      .agg(TopKFunctions.topk(col("cos_sim"), col("id_b"), 3, false).as("top"))
    time("topk_cut_count") { cut.count() }
    time("full_q_knn") { graft.ops.Similarity.qKnn(spark, dir).count() }
    time("full_q_knn_again") { graft.ops.Similarity.qKnn(spark, dir).count() }
    spark.stop()
  }
}
