package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TopKAggregator, VectorFunctions}

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
      // both sides of every pair join read this — persist so the
      // cast+normalize runs once, not once per join side (at scale:
      // the materialized normalized-embedding table)
      .persist()
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

  /** Bounded top-k cut per id_a on (cos_sim desc, id_b asc) — a typed
    * [[graft.functions.TopKAggregator]] (map-side-combinable, buffer ≤ k)
    * instead of a window: the shuffle carries k rows per group per map
    * partition, not every scored pair, and no partition-wide sort runs.
    * Tie semantics identical to `row_number() over (...) <= k`. */
  private def topKCut(pairs: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    pairs
      .groupBy("id_a")
      .agg(topk(col("cos_sim"), col("id_b")).as("top"))
      .select(col("id_a"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("id_a"), (col("pos") + 1).cast("int").as("rn"),
              col("p._2").as("id_b"), col("p._1").as("cos_sim"))
      .orderBy("id_a", "rn")
  }

  /** q_knn: per-vector k=3 nearest neighbours by cosine. Each unordered
    * pair is scored ONCE (id_a < id_b, halves the dot products), then
    * mirrored via explode into both directions for the per-vector cut. */
  def qKnn(spark: SparkSession, dir: String): DataFrame = {
    val u = normalized(spark, dir)
    val a = u.select(col("vec_id").as("id_a"), col("vn").as("vn_a"))
    val b = u.select(col("vec_id").as("id_b"), col("vn").as("vn_b"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(VectorFunctions.dot(col("vn_a"), col("vn_b")), 6).as("cos_sim"))
      .select(explode(array(
        struct(col("id_a"), col("id_b"), col("cos_sim")),
        struct(col("id_b").as("id_a"), col("id_a").as("id_b"), col("cos_sim"))))
        .as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
              col("p.cos_sim").as("cos_sim"))
    topKCut(pairs, 3)
  }

  /** q_dedup_embed: embedding-cosine near-duplicate pairs (cos ≥ 0.4 on
    * this data — no planted dups, so the threshold sits at the top
    * ~0.1% of the pair distribution). Same normalized-once + codegen
    * dot discipline as the top-k query. */
  def qDedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val u = normalized(spark, dir)
    val a = u.select(col("vec_id").as("id_a"), col("vn").as("vn_a"))
    val b = u.select(col("vec_id").as("id_b"), col("vn").as("vn_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(VectorFunctions.dot(col("vn_a"), col("vn_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .orderBy("id_a", "id_b")
  }

  /** q_ann_ivf: approximate nearest neighbour via hyperplane-LSH
    * bucketing — the sub-quadratic scale path for [[qKnn]].
    *
    * Index: h seeded random hyperplanes (h scales with the corpus:
    * h ≈ log2(√n), so bucket count ≈ √n and mean bucket size ≈ √n —
    * the classic IVF sizing; no data column like `label` is assumed).
    * Each vector's bucket is its h-bit sign pattern; the hyperplanes
    * are driver-side literals (h·d doubles — O(KB), the analog of a
    * broadcast codebook). The single `count()` is the index-build
    * (training) step, offline at scale.
    *
    * Search: multi-probe radius 1 — each query probes its own bucket
    * plus the h single-bit flips, then joins the inverted lists on
    * bucket id (the only shuffle key), scores candidates with the
    * codegen dot, and cuts to a bounded top-3. Pair uniqueness is by
    * construction (a candidate's home bucket is unique; probe masks
    * are distinct), so no dedup stage. Candidate fraction ≈
    * (h+1)/2^h of the pair space (~11% at sf0.1) vs nprobe/k ≈ 40%
    * for the old label-IVF. Near-uniform vectors keep buckets
    * balanced; a skewed corpus would salt the hot buckets
    * ([[graft.ops.Skew]]). Oracle-exempt; golden asserts recall@3
    * vs the exact kNN.
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(spark)
    val base = normalized(spark, dir)
    // index-build step: size the code length to the corpus
    val n = Tables.embeddings(spark, dir).count()
    val h = math.max(3,
      math.round(math.log(math.sqrt(n.toDouble)) / math.log(2)).toInt)
    val dim = 64
    val rng = new scala.util.Random(42)
    val planes = Array.fill(h)(Array.fill(dim)(rng.nextGaussian()))
    val bucketCol = planes.zipWithIndex.map { case (p, j) =>
      when(VectorFunctions.dot(col("vn"), typedlit(p.toSeq)) >= 0d,
           lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val bucketed = base.withColumn("bucket", bucketCol)
    val home = bucketed.select(col("vec_id").as("id_b"),
                               col("vn").as("vn_b"), col("bucket"))
    val probeMasks = array((lit(0) +: (0 until h).map(j => lit(1 << j))): _*)
    val probes = bucketed.select(
      col("vec_id").as("id_a"), col("vn").as("vn_a"),
      explode(transform(probeMasks, m => col("bucket").bitwiseXOR(m)))
        .as("bucket"))
    val cands = probes.join(home, Seq("bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(VectorFunctions.dot(col("vn_a"), col("vn_b")), 6).as("cos_sim"))
    topKCut(cands, 3)
  }
}
