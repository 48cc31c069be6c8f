package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.ops.Similarity

/** τ-sweep timing of the exact grid similarity scan — the
  * early-exit-bound evidence run (SCALING.md r12): the Cauchy–Schwarz
  * abandon fires earlier the higher the threshold, so wall time must
  * FALL as τ rises even though the pair count is fixed —
  * `tools/run_main.sh graft.tools.SimTauBench [sfDir]`. */
object SimTauBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmpdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    // warm (codegen + page cache)
    Similarity.embeddingNearDups(emb, 0.9).count()
    for (tau <- Seq(0.2, 0.4, 0.6, 0.9)) {
      val t0 = System.nanoTime()
      val n = Similarity.embeddingNearDups(emb, tau).count()
      println(f"SIM_TAU tau=$tau%.1f pairs_out=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
