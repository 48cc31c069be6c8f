package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Retrieval-search operators: hybrid lexical+dense rank fusion and
  * positional phrase matching — the query side of the RAG data path.
  * The corpus side (inverted index, chunking, ANN posting tables) is
  * [[Curation.invertedIndex]] / [[Curation.chunkDocs]] /
  * [[Similarity]]; these operators consume those signals to rank.
  */
object Search {

  /** RRF dampening constant (Cormack & Clarke & Buettcher, SIGIR 2009:
    * k = 60 is the published default and is remarkably robust). */
  val RrfK: Int = 60
  /** Fixed dense-probe vector id for q_hybrid_rrf (exists at every SF:
    * ScaleGen replica 0 keeps original ids). */
  val HybridProbeId: Long = 7L
  /** Per-system candidate-pool depth before fusion. */
  val HybridPoolK: Int = 100
  /** Fused result cut. */
  val HybridTopN: Int = 50

  /** Hybrid retrieval: Reciprocal Rank Fusion of a lexical (BM25) and
    * a dense (cosine-vs-probe) candidate pool —
    * `score(d) = Σ_s 1/(k + rank_s(d))` over the systems that
    * retrieved `d`. Rank-space fusion needs no score calibration
    * between BM25 logits and cosines, which is why RRF is the default
    * fuser in hybrid RAG stacks.
    *
    * Scale: each pool is produced by its own scale path (BM25 prunes
    * non-matching docs before exploding, [[Text.bm25]]; the dense side
    * is one broadcast probe row against a narrow normalized
    * projection — O(n) dots, no pair join) and is cut to `poolK`
    * BEFORE fusion, so the rank windows and the full-outer fusion join
    * run on ≤ 2·poolK rows on one partition — bounded by construction,
    * independent of corpus size. Ranks tie-break on rounded scores
    * then doc_id, so rank assignment is reproducible across engines.
    */
  def hybridRrf(docToks: DataFrame, embeddings: DataFrame,
                queryTerms: Seq[String] = Text.Bm25Query,
                probeId: Long = HybridProbeId,
                poolK: Int = HybridPoolK, rrfK: Int = RrfK,
                topN: Int = HybridTopN): DataFrame = {
    val lex = Text.bm25(docToks, queryTerms, topK = poolK)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id").asc)).as("lex_rank"))
    val u = Similarity.normalizeEmbeddings(embeddings)
    val probe = broadcast(
      u.where(col("vec_id") === probeId).select(col("vn").as("pv")))
    val dense = u.where(col("vec_id") =!= probeId)
      .crossJoin(probe)
      .select(col("vec_id").as("doc_id"),
        round(VectorFunctions.dot(col("vn"), col("pv")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
      .limit(poolK)
      .select(col("doc_id"),
        row_number().over(
          Window.orderBy(col("cos_sim").desc, col("doc_id").asc)).as("dense_rank"))
    // rank 0 = "not retrieved by that system" (contributes nothing);
    // the CASE guards run BEFORE the sentinel can reach a divisor
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"))
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        round(
          when(col("lex_rank") === 0, lit(0.0))
            .otherwise(lit(1.0) / (col("lex_rank") + lit(rrfK))) +
          when(col("dense_rank") === 0, lit(0.0))
            .otherwise(lit(1.0) / (col("dense_rank") + lit(rrfK))), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topN)
  }

  /** q_hybrid_rrf: [[hybridRrf]] of the fixture corpus — BM25 over
    * [[Text.Bm25Query]] fused with cosine against probe vector
    * [[HybridProbeId]] (documents and embeddings share the id space). */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.docTokens(spark, dir), Tables.embeddings(spark, dir))

  /** The fixed phrase used by q_phrase_search (present in the fixture
    * corpus at every SF). */
  val Phrase: Seq[String] = Seq("big", "order", "scan")

  /** Positional phrase search: documents where `phrase` occurs as
    * CONSECUTIVE tokens, with occurrence count and first match
    * position (1-based). The match is evaluated entirely inside the
    * row by a native expression ([[graft.functions.PhrasePositions]],
    * one tight UTF8String scan per doc — r9; the higher-order-function
    * form paid Spark's interpreted per-element lambda dispatch), so
    * the operator is a narrow projection + filter: no explode, no
    * positional self-join, no shuffle before the output sort.
    * Overlapping occurrences count individually (positions advance by
    * 1, not by |p|). A 100 TB corpus scans once; the phrase literal
    * rides the plan, not a join.
    */
  def phraseSearch(docToks: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    // one tight per-row scan via the native expression
    // (graft.functions.PhrasePositions): the original
    // `filter(sequence(1, n), i -> slice(toks, i, |p|) == p)`
    // higher-order-function form ran each position through Spark's
    // INTERPRETED lambda path (~9 µs/position — 30 s for the sf1
    // corpus scan vs ~2 s here); same semantics, same outputs
    graft.functions.PhraseFunctions.register(docToks.sparkSession)
    val positions =
      graft.functions.PhraseFunctions.phrasePositions(col("toks"), phrase)
    docToks
      .select(col("doc_id"), positions.as("pos"))
      .where(size(col("pos")) > 0)
      .select(col("doc_id"),
              size(col("pos")).as("n_matches"),
              element_at(col("pos"), 1).as("first_pos"))
      .orderBy("doc_id")
  }

  /** q_phrase_search: [[phraseSearch]] for [[Phrase]]. */
  def qPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.docTokens(spark, dir), Phrase)
}
