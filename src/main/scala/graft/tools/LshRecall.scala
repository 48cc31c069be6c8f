package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** q_dedup_near LSH quality at scale (VERDICT r10 stretch): the recall
  * curve of the production banding (12 bands × 4 rows) against the
  * exact shingle-Jaccard pair set, bucketed by similarity — run at sf1
  * to quantify what the banding misses where (the similarity-band
  * breakdown is the tuning signal: overall recall hides that misses
  * concentrate at the τ boundary).
  *
  * Ground truth: the SAME pipeline at 48 bands × 1 row, whose
  * candidate probability is 1-(1-J)^48 — at the τ = 0.8 floor the
  * per-pair miss probability is (1-J)^48 ≤ 0.2^48 < 1e-33, i.e.
  * exhaustively exact for every pair that can appear in the truth set,
  * while still running the scale-safe bucket join (a literal all-pairs
  * scan would be the quadratic non-starter this operator exists to
  * avoid). Verification is exact in BOTH runs (precision 1 by
  * construction), so recall is purely the banding's candidate loss.
  *
  * `tools/run_main.sh graft.tools.LshRecall [sfDir] [tau]` */
object LshRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf1")
    val tau = if (args.length > 1) args(1).toDouble else 0.8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(bands: Int): (org.apache.spark.sql.DataFrame, Double) = {
      val t0 = System.nanoTime()
      val p = Dedup.nearDupPairs(Tables.docTokens(spark, dir), tau, bands)
        .select("doc_a", "doc_b", "jac")
      val out = p.cache()
      out.count()
      (out, (System.nanoTime() - t0) / 1e9)
    }
    val (truth, tTruth) = run(48)
    val (lsh, tLsh) = run(12)
    val nTruth = truth.count(); val nLsh = lsh.count()

    // per-similarity-bucket recall: [0.80,0.85) ... [0.95,1.0) and the
    // exact-1.0 duplicates; buckets from the TRUTH pair's exact jac
    val hit = truth.join(lsh.select(col("doc_a"), col("doc_b"),
                                    lit(1).as("found")),
                         Seq("doc_a", "doc_b"), "left")
    val buckets = hit
      .withColumn("bucket",
        when(col("jac") >= 1.0, lit("1.00"))
          .otherwise(format_number(floor(col("jac") * 20) / 20, 2)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_truth"),
           sum(coalesce(col("found"), lit(0))).as("n_found"))
      .orderBy("bucket")
      .collect()

    println(f"LSH_RECALL dir=$dir tau=$tau " +
      f"truth_pairs=$nTruth lsh_pairs=$nLsh " +
      f"overall_recall=${nLsh.toDouble / math.max(nTruth, 1)}%.4f " +
      f"t_truth=$tTruth%.1fs t_lsh=$tLsh%.1fs")
    buckets.foreach { r =>
      val n = r.getLong(1); val f0 = r.getLong(2)
      println(f"LSH_BUCKET jac=${r.getString(0)} n=$n found=$f0 " +
        f"recall=${f0.toDouble / math.max(n, 1)}%.4f")
    }
    spark.stop()
  }
}
