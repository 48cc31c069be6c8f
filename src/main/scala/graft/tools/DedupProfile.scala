package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** Stage-level profile for q_dedup_near — where does the wall time go
  * at a given scale? `sbt "runMain graft.tools.DedupProfile [sfDir]"` */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DEDUP_STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    graft.functions.SetFunctions.register(
      spark, Dedup.permA, Dedup.permB, Dedup.MersennePrime)
    // one shingle materialization, un-persisted (the per-doc cost)
    val sh = Tables.docTokens(spark, dir)
      .select(col("doc_id"), Dedup.shingleHashes(col("toks")).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles_once") { sh.count() }
    time("shingles_again") { sh.count() }
    time("signatures") {
      sh.select(Dedup.minhashSig(col("sh")).as("sig")).count()
    }
    time("full_cold") { Dedup.qDedupNear(spark, dir).count() }
    spark.catalog.clearCache()
    time("full_again") { Dedup.qDedupNear(spark, dir).count() }
    // jaccard timings live in JaccardProfile, which drives the REAL
    // code paths instead of a replica that can drift
    spark.stop()
  }
}
