package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Stage profile for q_embed_pca: covMatrix collect vs projection. */
object PcaProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf10mp")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PCAPROF $tag ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val emb = Tables.embeddings(spark, dir)
    time("warm-count") { emb.count() }
    time("cov-collect") { Similarity.covMatrix(emb).collect() }
    time("cov-collect-2") { Similarity.covMatrix(emb).collect() }
    VectorFunctions.register(spark)
    val v = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val lits = array((0 until 64).map(i => lit(i * 0.01)): _*)
    time("transform-only") {
      // force the cast-transform to actually run: a vec_id-only count
      // would let Catalyst prune `v` away entirely (the same pitfall
      // SCALING.md §r11 records for the cov count() smoke)
      v.agg(sum(element_at(col("v"), 1))).collect()
    }
    time("proj-dot") {
      v.select(col("vec_id"), round(VectorFunctions.dot(col("v"), lits), 6)
        .as("pc1")).count()
    }
    time("proj-dot-sorted") {
      v.select(col("vec_id"), round(VectorFunctions.dot(col("v"), lits), 6)
        .as("pc1")).orderBy("vec_id").count()
    }
    time("full-pca") { Similarity.pcaProject(emb, 2).count() }
    spark.stop()
  }
}
