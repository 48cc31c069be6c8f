package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE merge-table LEARNING (Sennrich et al. 2016) — the tokenizer
  * TRAINING step that produces the ordered merge list
  * [[graft.functions.Bpe]] applies: in production the tokenizer is
  * trained on a corpus sample before any token counting can budget in
  * model tokens.
  *
  * Distributed shape: the working state is the DISTINCT-WORD table
  * (word symbol array × corpus frequency) — vocabulary-scale, not
  * corpus-scale, so a 100 TB corpus trains over its ~10⁸-row
  * vocabulary after one corpus-wide word count. Each of the `nMerges`
  * rounds is one pair-count shuffle (map-side combined, weighted by
  * word frequency) + a deterministic argmax (`TakeOrderedAndProject`
  * of ONE row — count desc, then lexicographic pair, so ties can
  * never flip between runs) collected as model state (one row per
  * round, the kmeans-centroid contract), then a narrow merge rewrite
  * of the symbol arrays (scalar UDF: left-to-right non-overlapping
  * pair replacement, no builtin expresses an indexed adjacent-pair
  * rewrite) with a lazy localCheckpoint so the plan stays flat.
  *
  * Oracle-exempt (DuckDB has no iterative argmax-merge); golden:
  * BpeLearnSpec re-derives the merge list with an independent
  * single-node implementation on the same corpus and pins
  * equality, plus determinism and the planted-digraph property.
  */
object BpeTrain {

  /** Learn `nMerges` merges from any (doc_id, toks) DataFrame:
    * (rank, left, right, pair_count), rank 1 = first/highest-priority
    * merge. Stops early if no adjacent pair remains. */
  def learnBpeMerges(docToks: DataFrame, nMerges: Int = 20): DataFrame = {
    val spark = docToks.sparkSession
    import spark.implicits._
    val nParts = spark.sparkContext.defaultParallelism
    val mergePair = udf((syms: Seq[String], a: String, b: String) => {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    })
    var words = docToks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .repartition(nParts)
      .localCheckpoint()
    val merges = mutable.Buffer.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 1 to nMerges if !exhausted) {
      val top = words
        .filter(size(col("syms")) > 1)
        .select(col("freq"),
                explode(arrays_zip(
                  slice(col("syms"), lit(1), size(col("syms")) - 1),
                  slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((a, b, c))
        words = words
          .select(mergePair(col("syms"), lit(a), lit(b)).as("syms"), col("freq"))
          .localCheckpoint(false)
      }
    }
    merges.toSeq.zipWithIndex
      .map { case ((a, b, c), i) => (i + 1, a, b, c) }
      .toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** q_bpe_learn: the first 20 merges learned from the test corpus. */
  def qBpeLearn(spark: SparkSession, dir: String): DataFrame =
    learnBpeMerges(Tables.docTokens(spark, dir))
}
