package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Embedding-similarity operators (SURVEY.md §2.2 dedup/similarity).
  *
  * Shape discipline for scale: vectors are cast float→double ONCE and
  * L2-normalized ONCE in a narrow projection, so the quadratic pair
  * stage is a single codegen'd dot product per pair ([[graft.functions
  * .DotProduct]]) — never norm arithmetic inside the join. The exact
  * pair stage is O(n²) by definition (it IS the spec of these two
  * queries); the sub-quadratic scale path (LSH bucketing / IVF over the
  * same normalized vectors) is provided separately as q_ann_ivf.
  */
object Similarity {

  /** Normalized double vectors: (vec_id, vn) with |vn| = 1. */
  private[graft] def normalized(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(VectorFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id"),
              transform(col("v"), x => x / col("nrm")).as("vn"))
  }

  /** q_sim_cosine_topk: exact top-100 most-similar pairs (cosine). */
  def qSimCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val u = normalized(spark, dir)
    val a = u.select(col("vec_id").as("id_a"), col("vn").as("vn_a"))
    val b = u.select(col("vec_id").as("id_b"), col("vn").as("vn_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(VectorFunctions.dot(col("vn_a"), col("vn_b")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
      .limit(100)
  }

  /** q_knn: per-vector k=3 nearest neighbours by cosine — pair scores
    * + the window-top-k idiom (rank on the ROUNDED score with id
    * tiebreak, so the cut is deterministic across engines). */
  def qKnn(spark: SparkSession, dir: String): DataFrame = {
    val u = normalized(spark, dir)
    val a = u.select(col("vec_id").as("id_a"), col("vn").as("vn_a"))
    val b = u.select(col("vec_id").as("id_b"), col("vn").as("vn_b"))
    val w = Window.partitionBy("id_a").orderBy(col("cos_sim").desc, col("id_b").asc)
    a.join(b, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(VectorFunctions.dot(col("vn_a"), col("vn_b")), 6).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("id_a"), col("rn"), col("id_b"), col("cos_sim"))
      .orderBy("id_a", "rn")
  }
}
