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
  * vocabulary after one corpus-wide word count. Each round is one
  * pair-count shuffle (map-side combined, weighted by word frequency)
  * + a deterministic top-`batchMax` collect (count desc, then
  * lexicographic pair, so ties can never flip between runs; ≤64 rows
  * of model state, the kmeans-centroid contract), then ONE narrow
  * merge rewrite of the symbol arrays (scalar UDF: left-to-right
  * non-overlapping replacement, no builtin expresses an indexed
  * adjacent-pair rewrite) with an eager localCheckpoint so the plan
  * stays flat.
  *
  * MERGE BATCHING (r10, verdict ask #5): a production vocabulary is
  * ~30k merges, and one shuffle + driver round-trip PER merge is 30k
  * Spark jobs of latency. Each round instead accepts the maximal
  * PREFIX of the sorted candidate list that is greedy-equivalent to
  * one-at-a-time merging, proven by three invariants:
  *   1. prefix members are pairwise symbol-DISJOINT (treating each
  *      accepted pair's concatenation as a symbol too) — so applying
  *      one cannot create, destroy, or re-count instances of another:
  *      adjacency instances of (a,b) only interact with a merge that
  *      shares one of its symbols, and a created symbol can only
  *      collide through string equality with a named symbol;
  *   2. the prefix STOPS at the first conflicting candidate, so every
  *      conflicting pair — the only pairs whose merged instances can
  *      feed count into newly-created pairs — ranks strictly below
  *      every accepted member;
  *   3. accepted members must have count STRICTLY above the first
  *      excluded candidate's count (`cutoff` trim) — a new pair's
  *      count is bounded by some conflicting pair's old count ≤
  *      cutoff, so no created pair can tie or outrank any batch
  *      member at its turn in the greedy order.
  * Falls back to a single merge per round when the top-2 already
  * conflict (invariant 3 never trims below one: the argmax is always
  * greedy-safe). BpeLearnSpec pins batched ≡ unbatched ≡ the
  * independent single-node reference.
  *
  * Oracle-exempt (DuckDB has no iterative argmax-merge); golden:
  * BpeLearnSpec re-derives the merge list with an independent
  * single-node implementation on the same corpus and pins
  * equality, plus determinism and the planted-digraph property.
  */
object BpeTrain {

  /** Greedy-equivalent batch from the sorted top candidates: the
    * maximal pairwise-disjoint prefix (concatenations count as
    * symbols), trimmed to counts strictly above the first excluded
    * candidate's (or the window tail's, whenever the collected window
    * may be TRUNCATED — `top.size == windowMax` — since out-of-window
    * pairs are bounded by the tail count but could tie it and rank
    * earlier lexicographically). Never empty when `top` isn't: the
    * argmax alone is always greedy-safe.
    *
    * `windowMax` is the `limit(...)` used to collect `top`; callers
    * must pass it so the truncation trim fires independently of
    * `limit` (r10 advice: with `limit > windowMax` a conflict-free
    * full window previously escaped the trim). */
  private[graft] def greedyBatch(
      top: Seq[(String, String, Long)], limit: Int,
      windowMax: Int = Int.MaxValue): Seq[(String, String, Long)] = {
    val used = mutable.Set.empty[String]
    val prefix = mutable.Buffer.empty[(String, String, Long)]
    var cutoff = Option.empty[Long]
    val it = top.iterator
    while (it.hasNext && cutoff.isEmpty && prefix.size < limit) {
      val cand @ (a, b, _) = it.next()
      if (used(a) || used(b)) cutoff = Some(cand._3)
      else { prefix += cand; used ++= Seq(a, b, a + b) }
    }
    if (cutoff.isEmpty && prefix.size < top.size) cutoff = Some(top(prefix.size)._3)
    // window possibly truncated by the collect limit: pairs beyond it
    // are bounded by the last collected count — trim to strictly above
    // it (keyed on windowMax, NOT limit: a conflict-free full window
    // with limit > windowMax is still truncated)
    if (cutoff.isEmpty && top.size >= windowMax) cutoff = Some(top.last._3)
    val trimmed = cutoff match {
      case Some(c) => prefix.takeWhile(_._3 > c)
      case None    => prefix // candidate list exhausted: nothing below
    }
    (if (trimmed.isEmpty) prefix.take(1) else trimmed).toSeq
  }

  /** Learn `nMerges` merges from any (doc_id, toks) DataFrame:
    * (rank, left, right, pair_count), rank 1 = first/highest-priority
    * merge. Stops early if no adjacent pair remains. */
  def learnBpeMerges(docToks: DataFrame, nMerges: Int = 20,
                     batchMax: Int = 64): DataFrame = {
    val spark = docToks.sparkSession
    import spark.implicits._
    val nParts = spark.sparkContext.defaultParallelism
    // one pass, applying whichever batch pair starts at position i —
    // batch pairs are symbol-disjoint, so at most one can match there
    // and sequential per-pair passes would rewrite identically
    val mergeBatch = udf((syms: Seq[String], as: Seq[String], bs: Seq[String]) => {
      val byLeft = as.indices.map(i => as(i) -> bs(i)).toMap
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        val b = if (i + 1 < syms.length) byLeft.get(syms(i)) else None
        if (b.exists(_ == syms(i + 1))) { out += (syms(i) + syms(i + 1)); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.toSeq
    })
    var words = docToks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .repartition(nParts)
      .localCheckpoint()
    // re-size the LOOP width from the materialized vocabulary count
    // (r16, the dedupClusters discipline): the distinct-word table is
    // vocabulary-scale — at test SFs a few thousand rows — and a
    // defaultParallelism-wide checkpoint froze every merge round at
    // that many near-empty tasks. One cheap count job right-sizes the
    // whole loop; a 10^8-row production vocabulary keeps full width.
    val vParts = math.max(1L, math.min(nParts.toLong,
      words.count() / 262144L + 1L)).toInt
    if (vParts < nParts)
      words = words.repartition(vParts).localCheckpoint()
    val merges = mutable.Buffer.empty[(String, String, Long)]
    var exhausted = false
    // fixed-width loop regime (r17): see [[Tables.withIterConf]]
    graft.Tables.withIterConf(spark, vParts) {
    while (merges.size < nMerges && !exhausted) {
      val top = words
        .filter(size(col("syms")) > 1)
        .select(col("freq"),
                explode(arrays_zip(
                  slice(col("syms"), lit(1), size(col("syms")) - 1),
                  slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(batchMax).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      if (top.isEmpty) exhausted = true
      else {
        val batch = greedyBatch(top, nMerges - merges.size, batchMax)
        merges ++= batch
        words = words
          .select(mergeBatch(col("syms"),
                             array(batch.map(m => lit(m._1)): _*),
                             array(batch.map(m => lit(m._2)): _*)).as("syms"),
                  col("freq"))
          .localCheckpoint()
      }
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
